"""Round-5 probe B: localize the config-1 chunk-3 fault.

probe_r5_a (with CR range clamps, safe norms and the du cap in place)
still crashes at the chunk covering steps 25-32, with chunk 2 showing a
121-iteration Newton spike and one non-converged step.  Two questions:

1. Ground truth: does the SAME program on XLA:CPU (real f64) also fail
   to converge the spike step?  (If yes, TPU matches CPU bit-for-bit on
   the physics and only the crash differs.)
2. Mechanism: replay chunk 3+ on TPU ONE STEP at a time with wall-clock
   per step.  If single steps complete (even at ~100 iters each), the
   8-step dispatch dies from execution DURATION (worker watchdog), not
   arithmetic — the fix is chunked dispatch, not more clamps.
"""
import os
import sys
import time

os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gmpnp_tpu.models import rxn_diff_1d
from gmpnp_tpu.solve.timeloop import make_implicit_step

cfg = rxn_diff_1d.RxnDiff1DConfig(L_n=50.0e-6)
prog = rxn_diff_1d.build(cfg)
step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                          bc_of_theta=lambda theta: prog.bc)
N = prog.space.num_vertices


def run8(u0):
    def body(carry, i):
        u_new, st = step(carry, prog.theta)
        return u_new, (st.newton_iters, st.converged)
    return jax.lax.scan(body, u0, jnp.arange(8))


def run1(u0):
    u_new, st = step(u0, prog.theta)
    return u_new, (st.newton_iters, st.converged, st.residual_norm)


# 1. CPU ground truth, chunks 0..5 (the spike region)
cpu = jax.devices("cpu")[0]
u = jax.device_put(jnp.ones((N, 5)), cpu)
r8c = jax.jit(run8, device=cpu).lower(u).compile()
print("CPU chunks:", flush=True)
for k in range(6):
    u, (it, cv) = r8c(u)
    print(f"  chunk {k} iters={int(np.asarray(it).sum()):4d} "
          f"nonconv={int((~np.asarray(cv)).sum())} "
          f"absmax={np.abs(np.asarray(u)).max():.4g}", flush=True)
u_cpu_24 = None

# 2. TPU: chunks 0-2 via the 8-step program, then single steps
accel = jax.devices()[0]
u = jax.device_put(jnp.ones((N, 5)), accel)
r8 = jax.jit(run8, device=accel).lower(u).compile()
for k in range(3):
    u, (it, cv) = r8(u)
    print(f"TPU chunk {k}: iters={int(np.asarray(it).sum()):4d} "
          f"nonconv={int((~np.asarray(cv)).sum())}", flush=True)

r1 = jax.jit(run1, device=accel).lower(u).compile()
print("TPU single steps 24..47:", flush=True)
for s in range(24, 48):
    t0 = time.time()
    try:
        u, (it, cv, rn) = r1(u)
        a = np.asarray(u)
        print(f"  step {s}: iters={int(it):3d} conv={bool(cv)} "
              f"|r|={float(rn):.3e} absmax={np.abs(a).max():.4g} "
              f"wall={time.time() - t0:.1f}s", flush=True)
    except Exception as e:
        print(f"  step {s}: CRASH after {time.time() - t0:.1f}s "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        break
