"""Fused DCT + quantization as MXU matmuls.

The reference runs a warp-shuffled AAN DCT with a pre-divided quant table
(src/gpujpeg_dct_gpu.cu:163-294, src/gpujpeg_table.c:111-120).  On TPU the
natural idiom is one large matmul: an 8x8 block flattened to 64 samples hits
a (64, 64) matrix that *is* the separable 2D DCT with zig-zag reordering and
quantizer reciprocals folded into its columns — one MXU pass produces
quantized zig-zag coefficients directly.  The -128 level shift folds into an
additive bias (the reference folds it into the first 1-D pass,
gpujpeg_dct_gpu.cu:251-261).

Inverse: (N, 64) zig-zag coefficients hit a (64, 64) dequant+IDCT matrix;
+128 / round / clamp match the reference's rintf semantics
(gpujpeg_dct_gpu.cu:608-613).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import tables


def plane_to_blocks(plane: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H/8 * W/8, 64) row-major blocks in raster order."""
    H, W = plane.shape
    x = plane.reshape(H // 8, 8, W // 8, 8)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(-1, 64)


def blocks_to_plane(blocks: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(H/8 * W/8, 64) -> (H, W)."""
    x = blocks.reshape(H // 8, W // 8, 8, 8)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(H, W)


def _use_split_bf16() -> bool:
    """MXU path selection: on TPU the (64, 64) DCT matrix is split into
    bf16 high + low halves (M = hi + lo, both exactly representable);
    uint8 samples are exact in bf16, so x@hi + x@lo with f32 accumulation
    recovers ~f32 accuracy at full-MXU bf16 speed — 2 passes instead of
    the 6 of Precision.HIGHEST's f32 emulation.  Override with
    GPUJPEG_TPU_DCT=f32."""
    import os

    if os.environ.get("GPUJPEG_TPU_DCT", "") == "f32":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def fdct_quantize(plane: jnp.ndarray, qtab_zz: np.ndarray) -> jnp.ndarray:
    """Forward DCT + quantize one component plane.

    plane: (data_h, data_w) integer samples in [0, 255]
    returns: (nblocks, 64) int16 quantized coefficients in zig-zag order.
    """
    Mq, bias = tables.fdct_fused_matrix(np.asarray(qtab_zz))
    if _use_split_bf16():
        hi = Mq.astype(np.float32).astype(jnp.bfloat16)
        lo = (Mq.astype(np.float32) - np.asarray(hi).astype(np.float32)
              ).astype(jnp.bfloat16)
        x = plane_to_blocks(plane).astype(jnp.bfloat16)
        y = (jnp.dot(x, jnp.asarray(hi),
                     preferred_element_type=jnp.float32)
             + jnp.dot(x, jnp.asarray(lo),
                       preferred_element_type=jnp.float32))
    else:
        x = plane_to_blocks(plane).astype(jnp.float32)
        y = jnp.dot(x, jnp.asarray(Mq),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    y = y + jnp.asarray(bias)
    # rintf == round-half-to-even, same as jnp.round
    return jnp.round(y).astype(jnp.int16)


def plane_to_blocks_t(plane: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (64, H/8 * W/8) TRANSPOSED blocks: sublane = in-block
    sample index (r*8+c), lane = block raster index.  Feeds the
    transposed DCT matmul so its output is already in the entropy
    megakernel's sublane-major layout — the post-matmul (S, rst*64).T
    full transpose (~10 ms at 8K in int16) collapses to a leading-dim
    shuffle."""
    H, W = plane.shape
    x = plane.reshape(H // 8, 8, W // 8, 8)
    x = x.transpose(1, 3, 0, 2)
    return x.reshape(64, -1)


def fdct_quantize_t(plane: jnp.ndarray, qtab_zz: np.ndarray) -> jnp.ndarray:
    """Forward DCT + quantize, transposed in/out: (H, W) samples ->
    (64, nblocks) int16 zig-zag coefficients (sublanes = coefficients)."""
    Mq, bias = tables.fdct_fused_matrix(np.asarray(qtab_zz))
    xt = plane_to_blocks_t(plane)
    if _use_split_bf16():
        hi = Mq.astype(np.float32).astype(jnp.bfloat16)
        lo = (Mq.astype(np.float32) - np.asarray(hi).astype(np.float32)
              ).astype(jnp.bfloat16)
        xb = xt.astype(jnp.bfloat16)
        y = (jnp.dot(jnp.asarray(hi).T, xb,
                     preferred_element_type=jnp.float32)
             + jnp.dot(jnp.asarray(lo).T, xb,
                       preferred_element_type=jnp.float32))
    else:
        y = jnp.dot(jnp.asarray(Mq).T, xt.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    y = y + jnp.asarray(bias)[:, None]
    return jnp.round(y).astype(jnp.int16)


def fdct_quantize_bd(plane: jnp.ndarray, qtab_zz: np.ndarray,
                     rst: int) -> jnp.ndarray:
    """Forward DCT + quantize straight into the entropy megakernel's
    SEGMENT-COLUMN layout: (H, W) samples -> (rst*64, S) int16 zig-zag
    coefficients, sublane = block-within-segment * 64 + zz, lane =
    segment (raster order).

    One block-diagonal MXU matmul (kron(I_rst, Mq), e.g. 512x512 for
    rst=8) replaces the per-block (64,64) matmul PLUS the whole
    post-matmul regroup chain ((64,S,rst) transposes + concat
    dynamic-update-slices, ~1 GB of copies at 8K).  Requires segments
    that do not wrap block rows: blocks_per_row % rst == 0 (true for
    every standard width at the tuned rst=8; the caller falls back to
    fdct_quantize_t otherwise).
    """
    H, W = plane.shape
    nbh, bpr = H // 8, W // 8
    assert bpr % rst == 0
    nsr = bpr // rst
    x = plane.reshape(nbh, 8, nsr, rst, 8)
    x = x.transpose(3, 1, 4, 0, 2).reshape(rst * 64, nbh * nsr)
    Mq, bias = tables.fdct_fused_matrix(np.asarray(qtab_zz))
    bias_t = np.tile(np.asarray(bias), rst)[:, None]
    if _use_split_bf16():
        hi = Mq.astype(np.float32).astype(jnp.bfloat16)
        lo = (Mq.astype(np.float32) - np.asarray(hi).astype(np.float32)
              ).astype(jnp.bfloat16)
        bd_hi = np.kron(np.eye(rst, dtype=np.float32),
                        np.asarray(hi).T.astype(np.float32)
                        ).astype(jnp.bfloat16)
        bd_lo = np.kron(np.eye(rst, dtype=np.float32),
                        np.asarray(lo).T.astype(np.float32)
                        ).astype(jnp.bfloat16)
        xb = x.astype(jnp.bfloat16)
        y = (jnp.dot(jnp.asarray(bd_hi), xb,
                     preferred_element_type=jnp.float32)
             + jnp.dot(jnp.asarray(bd_lo), xb,
                       preferred_element_type=jnp.float32))
    else:
        bd = np.kron(np.eye(rst, dtype=np.float64), np.asarray(Mq).T)
        y = jnp.dot(jnp.asarray(bd.astype(np.float32)),
                    x.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    y = y + jnp.asarray(bias_t.astype(np.float32))
    return jnp.round(y).astype(jnp.int16)


def dequantize_idct_traced(coefs: jnp.ndarray, qtab_zz: jnp.ndarray,
                           H: int, W: int) -> jnp.ndarray:
    """Dequant + IDCT with a runtime quant table (decoder path: the table
    comes from the parsed stream, so it must be a traced argument to avoid
    per-stream recompiles)."""
    N = tables.idct2d_matrix_zz().astype(np.float32)
    y = coefs.astype(jnp.float32) * qtab_zz.astype(jnp.float32)[None, :]
    x = jnp.dot(y, jnp.asarray(N), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    x = jnp.clip(jnp.round(x + 128.0), 0, 255).astype(jnp.int32)
    return blocks_to_plane(x, H, W)


def dequantize_idct(coefs: jnp.ndarray, qtab_zz: np.ndarray,
                    H: int, W: int) -> jnp.ndarray:
    """Dequantize + inverse DCT -> (H, W) int32 samples in [0, 255]."""
    Ni = tables.idct_fused_matrix(np.asarray(qtab_zz))
    y = coefs.astype(jnp.float32)
    x = jnp.dot(y, jnp.asarray(Ni), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    x = jnp.clip(jnp.round(x + 128.0), 0, 255).astype(jnp.int32)
    return blocks_to_plane(x, H, W)
