"""Round-5 probe A: does the exponent-range guard fix BASELINE config 1?

Round 4 root cause (probes/probe_r4_c.py, docs/TPU_NOTES.md): the full
500-step 1D rxn-diff schedule (N=5991, tridiag_cr f64) kernel-faults the
TPU worker at the chunk covering steps 25-32, right after a 121-iteration
Newton spike — a near-singular pivot inverse in the f64 cyclic reduction
overflows the f32 exponent range that TPU-emulated f64 inherits.

This probe replays the same chunked schedule with the range clamps
(solve/smallblock.py RANGE_LIM) in place, reports Newton iters and
non-converged step counts per chunk, and compares the final state to the
same program on XLA:CPU (real f64).
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
print(f"N={N} steps={prog.num_steps} linear={cfg.linear.kind}/"
      f"{cfg.linear.solve_dtype}", flush=True)


def run8(u0):
    def body(carry, i):
        u_new, st = step(carry, prog.theta)
        return u_new, (st.newton_iters, st.converged)
    return jax.lax.scan(body, u0, jnp.arange(8))


def replay(device, n_chunks=63):
    u0 = jax.device_put(jnp.ones((N, 5)), device)
    r8 = jax.jit(run8, device=device).lower(u0).compile()
    u = u0
    t0 = time.time()
    for k in range(n_chunks):
        try:
            u, (iters, conv) = r8(u)
            a = np.asarray(u)
            nc = int((~np.asarray(conv)).sum())
            msg = (f"  chunk {k:2d} (steps {(k + 1) * 8:3d}): "
                   f"absmax={np.abs(a).max():.4g} "
                   f"iters={int(np.asarray(iters).sum()):4d} nonconv={nc}")
            if k < 6 or nc or int(np.asarray(iters).sum()) > 40:
                print(msg, flush=True)
        except Exception as e:
            print(f"  chunk {k}: CRASH {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return None, time.time() - t0
    return np.asarray(u), time.time() - t0


accel = jax.devices()[0]
print(f"replay on {accel} ...", flush=True)
u_tpu, t_tpu = replay(accel)
if u_tpu is None:
    print("TPU REPLAY STILL CRASHES", flush=True)
    sys.exit(1)
print(f"TPU replay complete in {t_tpu:.1f}s", flush=True)

cpu = jax.devices("cpu")[0]
print("CPU reference replay ...", flush=True)
u_cpu, t_cpu = replay(cpu)
rel = (np.linalg.norm(u_tpu - u_cpu) / np.linalg.norm(u_cpu))
print(f"CPU replay {t_cpu:.1f}s; TPU-vs-CPU final-state rel-L2 = {rel:.3e}",
      flush=True)
