"""Experimental fused Pallas packer: interpreter-mode correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.mark.parametrize("T", [8, 100, 768])
def test_pallas_pack_interpret_matches_xla(T, monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    import importlib

    from gpujpeg_tpu.ops import bitmerge
    from gpujpeg_tpu.ops import pallas_pack
    importlib.reload(pallas_pack)

    rng = np.random.default_rng(T)
    R = 16
    lens = rng.integers(0, 27, size=(R, T)).astype(np.int32)
    lens[rng.random(size=(R, T)) < 0.6] = 0
    bits = np.zeros((R, T), np.uint32)
    for idx in zip(*np.nonzero(lens > 0)):
        bits[idx] = rng.integers(0, 1 << lens[idx])
    caps = bitmerge.worst_caps(T, 27)
    rw, rb, _ = bitmerge.pack_rows_merge(jnp.asarray(bits),
                                         jnp.asarray(lens), caps=caps)
    fn = pallas_pack.make_pack_kernel(R, T, caps, tile_rows=8)
    w, b2 = fn(jnp.asarray(bits), jnp.asarray(lens))
    nw = (int(np.asarray(rb).max()) + 31) // 32
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(rb))
    np.testing.assert_array_equal(np.asarray(w)[:, :nw],
                                  np.asarray(rw)[:, :nw])
