import os, time, sys
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
d = jax.devices()[0]
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
        return u_new, st.newton_iters
    return jax.lax.scan(body, u0, jnp.arange(8))

u0 = jax.device_put(jnp.ones((N, 5)), d)
r8 = jax.jit(run8).lower(u0).compile()
u = u0
for k in range(63):
    try:
        u, iters = r8(u)
        a = np.asarray(u)
        print(f"chunk {k} (steps {(k+1)*8}): max={a.max():.4g} "
              f"min={a.min():.4g} absmax={np.abs(a).max():.4g} "
              f"iters={int(np.asarray(iters).sum())}", flush=True)
    except Exception as e:
        print(f"chunk {k}: CRASH {type(e).__name__}: {str(e)[:150]}",
              flush=True)
        break

# Results (round 4): per-8-step chunks of the BASELINE config-1 schedule
# (N=5991, 5 fields, tridiag_cr, TPU v5e-1):
#   chunk 0 (steps  8): max=39.5  min=0.0287 iters=24
#   chunk 1 (steps 16): max=55.4  min=0.0194 iters=24
#   chunk 2 (steps 24): max=67.4  min=0.0157 iters=121   <- Newton spike
#   chunk 3: CRASH "TPU worker process crashed or restarted (kernel fault)"
# Single n=1 and n=8 scans run clean; a 100-step scan crashes, and the
# chunked replay crashes at the same PHYSICS time -> the fault follows the
# transient state, not the program shape.  See docs/TPU_NOTES.md round 4.
