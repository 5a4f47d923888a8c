import numpy as np
import jax.numpy as jnp
from gpujpeg_tpu.ops import bitmerge, fusedpack
import sys
sys.path.insert(0, 'tests')
from test_fusedpack import xla_reference, to_bytes, random_tokens

rng = np.random.default_rng(1234)
R, T = 5, 64
bits, lens = random_tokens(rng, R, T, max_len=20, density=0.8, ff_bias=True)
rst = np.full(R, 0xD3, np.uint32)
ref_rows, ref_bytes = xla_reference(bits, lens, rst, T)
w_out = int(np.max(ref_bytes)) // 4 + 4
rows, out_bytes, needs = fusedpack.pack_stuff_fused(
    jnp.asarray(bits), jnp.asarray(lens), rst,
    l0=0, z_cap=64, w_out=w_out, interpret=True)
rows, out_bytes = np.asarray(rows), np.asarray(out_bytes)
print("needs:", np.asarray(needs))
print("ref_bytes:", ref_bytes, "out_bytes:", out_bytes)
got = to_bytes(rows, out_bytes)
want = to_bytes(ref_rows, ref_bytes)
for i in range(R):
    if got[i] != want[i]:
        g, w = got[i], want[i]
        print(f"row {i}: len got={len(g)} want={len(w)}")
        for j in range(min(len(g), len(w))):
            if g[j] != w[j]:
                print(f"  first diff at byte {j}: got {g[j]:02x} want {w[j]:02x}")
                print("  got :", g[max(0,j-8):j+8].hex())
                print("  want:", w[max(0,j-8):j+8].hex())
                break
        break
