"""HW parity + timing for ops/sort_kernel.py vs jnp.lexsort.

Parity: bit-exact (keys AND payload order = lexsort stability) at the
north-star sizes. Timing: tunnel-safe device_time of the kernel sort, the
XLA lexsort triple, and sorted_unique end-to-end both ways.

Env: N (default 276480), GCDLSS_SORT_KERNEL is forced on for the kernel
rows regardless of the ambient setting.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from gcdlss_tpu.ops import sort_kernel as sk
from gcdlss_tpu.ops.coords import SENTINEL_HI, SENTINEL_LO, sorted_unique
from tpu_timing import device_time

N = int(os.environ.get("N", "276480"))
rng = np.random.default_rng(0)

# realistic key distribution: sorted-ish per scan is NOT assumed here —
# pool parent keys arrive unsorted, so use uniform random + 10% sentinels
hi = rng.integers(0, 1 << 20, N).astype(np.int32)
lo = rng.integers(0, 1 << 25, N).astype(np.int32)
sent = rng.random(N) < 0.1
hi[sent] = int(SENTINEL_HI)
lo[sent] = int(SENTINEL_LO)
pay = np.arange(N, dtype=np.int32)
hi_d, lo_d, pay_d = jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay)

kernel_sort = jax.jit(sk.sort3)


@jax.jit
def xla_sort(hi, lo):
    order = jnp.lexsort((lo, hi))
    return hi[order], lo[order], order


print(f"== sort parity at N={N} (npad {sk._next_pow2(max(N,1024))}) ==",
      flush=True)
t0 = time.time()
sh, sl, sp = jax.device_get(kernel_sort(hi_d, lo_d, pay_d))
print(f"kernel compile+run {time.time()-t0:.0f}s", flush=True)
order = np.lexsort((lo, hi))
ok = (np.array_equal(sh, hi[order]) and np.array_equal(sl, lo[order])
      and np.array_equal(sp, order))
print(f"parity: {'BIT-EXACT' if ok else 'MISMATCH'}", flush=True)
if not ok:
    bad = np.nonzero(sp != order)[0]
    print(f"first mismatches at {bad[:10]}", flush=True)
    sys.exit(1)

dt_k = device_time(kernel_sort, hi_d, lo_d, pay_d, n=16)
dt_x = device_time(xla_sort, hi_d, lo_d, n=16)
print(f"kernel sort3: {dt_k*1e3:.2f} ms   xla lexsort3: {dt_x*1e3:.2f} ms "
      f"({dt_x/dt_k:.2f}x)", flush=True)

cap = N // 2
os.environ["GCDLSS_SORT_KERNEL"] = "1"
uniq_kern = jax.jit(lambda h, l: sorted_unique(h, l, cap))
_ = jax.block_until_ready(uniq_kern(hi_d, lo_d))
dt_uk = device_time(uniq_kern, hi_d, lo_d, n=16)
os.environ["GCDLSS_SORT_KERNEL"] = "0"
uniq_xla = jax.jit(lambda h, l: sorted_unique(h, l, cap))
_ = jax.block_until_ready(uniq_xla(hi_d, lo_d))
dt_ux = device_time(uniq_xla, hi_d, lo_d, n=16)
print(f"sorted_unique kernel: {dt_uk*1e3:.2f} ms   xla: {dt_ux*1e3:.2f} ms "
      f"({dt_ux/dt_uk:.2f}x)", flush=True)

# unique-output equivalence (kernel path vs lexsort path)
a = jax.device_get(uniq_kern(hi_d, lo_d))
b = jax.device_get(uniq_xla(hi_d, lo_d))
flat_a = jax.tree_util.tree_leaves(a)
flat_b = jax.tree_util.tree_leaves(b)
same = all(np.array_equal(x, y) for x, y in zip(flat_a, flat_b))
print(f"sorted_unique outputs: {'IDENTICAL' if same else 'DIFFER'}",
      flush=True)
sys.exit(0 if same else 1)
