import os, time
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.solve.timeloop import make_implicit_step

for L, R, res in ((50e-9, 10e-9, None), (100e-9, 10e-9, (4, 59))):
    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=L, R=R, mesh_resolution=res)
    prog = pore_3d.build(cfg)
    N = prog.space.num_vertices
    print(f"L={L*1e9:.0f} R={R*1e9:.0f}: N={N}, cells={len(prog.space.cells)}")
    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)
    nf, ns = cfg.n_fields, len(cfg.species)
    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    carry = (u0, jnp.asarray(0.0))
    t0 = time.time()
    for i in range(2):
        th = prog._theta_of_carry(carry, jnp.asarray(i))
        u, st = jax.jit(step)(carry[0], th)
        u.block_until_ready()
        print(f"  step {i}: iters={int(st.newton_iters)} conv={bool(st.converged)} "
              f"lin={int(st.linear_iters)} t={time.time()-t0:.1f}s")
        carry = (u, carry[1])

# Results (round 4, single bench core, contended):
#   L=50 R=10 (shipped L_50_R_10.xml): N=5411, cells=24984
#     step 0: iters=5 conv=True lin=15   step 1: iters=2 conv=True lin=6
#     ~200 s/Newton-iter on CPU — the R=10 cross-section grows the slab
#     block m (block-Thomas O(S*m^3)); informs the pore_r10 CPU-baseline
#     protocol (reps=1) and the sweep_r10 TPU-only record (bench.py).
#   L=100 R=10 (generated, mesh_resolution=(4,59)): N=3660, cells=16992
#     step 0: iters=5 conv=True lin=15   step 1: iters=2 conv=True lin=6
#     ~11 s/Newton-iter on CPU (same aspect/density as shipped L_50_R_5).
