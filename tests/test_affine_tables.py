"""Tuned computable AC tables (tables.AFFINE_AC_PARAMS family).

The arithmetic runtime formula must reproduce the canonical LUT exactly,
the tokenizer fast path must match the dense select-chain path token for
token, and tuned-family streams must decode identically to annexk-family
streams (same pixels; only the entropy coding differs).
"""

import io

import numpy as np
import pytest

import jax.numpy as jnp

from gpujpeg_tpu.utils import tables
from gpujpeg_tpu.ops import tokens


@pytest.mark.parametrize("key", sorted(tables.AFFINE_AC_PARAMS))
def test_affine_formula_matches_canonical_lut(key):
    p = tables.AFFINE_AC_PARAMS[key]
    t0, rt, al, eob, zrl = tables.affine_ac_runtime(*p)
    bits, values = tables.affine_ac_spec(*p)
    lut = tables.huffman_encode_lut(bits, values, 256)
    for r in range(16):
        for s in range(1, 11):
            want = int(lut[(r << 4) | s])
            if r == 0:
                got = int(t0[s])
            else:
                rl = int(rt[r]) >> 20
                B = int(rt[r]) & 0xFFFFF
                l = rl + s
                code = B + s if l >= 16 else int(al[l]) + r
                got = (min(l, 16) << 16) | code
            assert got == want, (key, r, s, hex(got), hex(want))
    assert int(lut[0x00]) == int(eob)
    assert int(lut[0xF0]) == int(zrl)


@pytest.mark.parametrize("key", sorted(tables.AFFINE_AC_PARAMS))
def test_affine_spec_is_valid_jpeg_table(key):
    """BITS sums to 162 symbols, lengths <= 16, all-ones code unused."""
    bits, values = tables.affine_ac_spec(*tables.AFFINE_AC_PARAMS[key])
    assert int(bits.sum()) == 162
    assert len(values) == 162
    assert sorted(values.tolist()) == sorted(
        [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                        for s in range(1, 11)])
    kraft = sum(int(bits[l]) << (16 - l) for l in range(1, 17))
    assert kraft <= (1 << 16) - 1


def test_tokenizer_affine_path_matches_chain(rng):
    """Fast arithmetic path == dense 256-entry chain, same tuned table."""
    q = 75
    for luma in (True, False):
        params = tables.affine_params_for_quality(q, luma)
        spec = tables.affine_ac_spec(*params)
        ac_lut = tables.huffman_encode_lut(*spec, 256).reshape(16, 16)
        dc_lut = tables.huffman_encode_lut(
            *tables.huffman_spec_for("dc", luma), 16)[:12]
        aff = tables.affine_ac_runtime(*params)

        coefs = rng.integers(-300, 300, (5, 4, 64)).astype(np.int16)
        mask = rng.random((5, 4, 64)) < 0.8
        coefs = np.where(mask, 0, coefs)
        b1, l1 = tokens.tokenize_rows(jnp.asarray(coefs), dc_lut, ac_lut)
        b2, l2 = tokens.tokenize_rows(jnp.asarray(coefs), dc_lut, ac_lut,
                                      ac_affine=aff)
        # lens must agree everywhere; bits wherever a token is emitted
        assert np.array_equal(np.asarray(l1), np.asarray(l2))
        emit = np.asarray(l1) > 0
        assert np.array_equal(np.asarray(b1)[emit], np.asarray(b2)[emit])


@pytest.mark.parametrize("key", sorted(tables.AFFINE_AC_PARAMS))
def test_affine_decode_matches_lut_exhaustively(key):
    """Arithmetic decode (clen, sym) == the 64Ki LUT for EVERY peek16."""
    from gpujpeg_tpu.ops import huffdec_kernel

    p = tables.AFFINE_AC_PARAMS[key]
    consts = tables.affine_ac_decode_runtime(*p)
    bits, values = tables.affine_ac_spec(*p)
    lut = tables.huffman_decode_lut16(bits, values)
    peek = jnp.arange(65536, dtype=jnp.int32)
    lum = jnp.ones((), bool) if key[1] == "luma" else jnp.zeros((), bool)
    # exercise the luma/chroma mux by passing the SAME consts both ways
    clen, sym = huffdec_kernel.affine_ac_decode(peek, lum, consts, consts)
    clen, sym = np.asarray(clen), np.asarray(sym)
    ref_len = (np.asarray(lut) >> 8).astype(np.int64)
    ref_sym = (np.asarray(lut) & 0xFF).astype(np.int64)
    valid = ref_len > 0
    assert np.array_equal(clen[valid], ref_len[valid]), key
    assert np.array_equal(sym[valid], ref_sym[valid]), key
    # invalid codes must report clen == 0
    assert np.all(clen[~valid] == 0), key


@pytest.mark.parametrize("luma", [True, False])
def test_dc_identity_decode_matches_lut(luma):
    from gpujpeg_tpu.ops import huffdec_kernel

    bits, values = tables.huffman_spec_for("dc", luma)
    assert tables.dc_values_identity(values)
    mono, roff = huffdec_kernel.dc_decode_runtime(bits, values)
    lut = tables.huffman_decode_lut16(np.asarray(bits), np.asarray(values))
    peek = jnp.arange(65536, dtype=jnp.int32)
    lum = jnp.asarray(luma)
    clen, sym = huffdec_kernel.dc_identity_decode(
        peek, lum, mono, mono, roff, roff)
    clen, sym = np.asarray(clen), np.asarray(sym)
    ref_len = (np.asarray(lut) >> 8).astype(np.int64)
    ref_sym = (np.asarray(lut) & 0xFF).astype(np.int64)
    valid = ref_len > 0
    assert np.array_equal(clen[valid], ref_len[valid])
    assert np.array_equal(sym[valid], ref_sym[valid])
    assert np.all(clen[~valid] == 0)


def test_match_affine_ac_roundtrip():
    p = tables.AFFINE_AC_PARAMS[(75, "luma")]
    bits, values = tables.affine_ac_spec(*p)
    got = tables.match_affine_ac(bits, values)
    assert got is not None
    assert tuple(got[0]) == tuple(p[0]) and tuple(got[1]) == tuple(p[1])
    # annexk must NOT match
    ab, av = tables.huffman_spec_for("ac", True)
    assert tables.match_affine_ac(ab, av) is None


def test_tuned_stream_decodes_like_annexk(rng):
    """Same pixels from either family; PIL decodes both."""
    from PIL import Image

    from gpujpeg_tpu import Encoder, Parameters

    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    pix = {}
    for fam in ("tuned", "annexk"):
        p = Parameters(quality=90, restart_interval=4, huffman_tables=fam)
        out = Encoder().encode(img, p)
        pix[fam] = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert np.array_equal(pix["tuned"], pix["annexk"])


def test_own_decoder_reads_tuned_stream(rng):
    """Our Decoder handles the tuned DHT (it only ever reads the stream)."""
    from gpujpeg_tpu import Decoder, Encoder, Parameters

    img = rng.integers(0, 256, (40, 48, 3), np.uint8)
    p = Parameters(quality=75, restart_interval=4)
    out = Encoder().encode(img, p)
    dec = np.asarray(Decoder().decode(out))
    assert dec.shape == img.shape
