# NOTE: gmpnp_tpu.ops.block_gj was REMOVED in round 4 (the kernel
# never compiled on hardware; VERDICT r3 item 7).  This historical
# round-2 probe can no longer run as-is; kept for the record.
raise SystemExit("probe retired: ops.block_gj removed in round 4 (docs/TPU_NOTES.md)")
"""Round-2 hardware probe E: vmapped slab-direct steps (the gate for the
config-5 sweep bench) and Pallas kernels on the tunneled TPU backend.

Probes (riskiest last; each independent):
  1. vmapped 2-lane slab_direct implicit step at bench mesh (3,24)
  2. vmapped 4-lane, same
  3. Pallas ell_block_contract on hardware (tiny shapes)
  4. Pallas block_inv_pallas on hardware (tiny shapes)

Run: python probes/probe_r2_e.py > /tmp/probe_e.log 2>&1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def build(cfg_kw, lin=None):
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", **cfg_kw)
    if lin is not None:
        object.__setattr__(cfg, "linear", lin)
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)
    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    theta = {"dt": jnp.asarray(prog.dt_scaled),
             "co2_s1": jnp.asarray(prog.eq_conc["CO2"]
                                   / prog.bulk_conc["CO2"])}
    return cfg, prog, step, u0, theta


def main():
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.solve.timeloop import LinearConfig

    log(f"device: {jax.devices()[0]}")
    slab_lin = LinearConfig(kind="slab_direct", tol=1e-6, max_refine=40)
    cfgB, progB, stepB, u0B, thetaB = build(
        dict(L=100e-9, R=10e-9, mesh_resolution=(3, 24)), slab_lin)
    log(f"bench mesh N={progB.space.num_vertices}")

    # ---- probe 1: vmapped 2-lane slab_direct step --------------------------
    for lanes in (2, 4):
        try:
            def batched(u0v):
                u, st = jax.vmap(lambda u: stepB(u, thetaB))(u0v)
                return u, st.newton_iters

            u0v = jnp.stack([u0B * (1.0 + 0.001 * i) for i in range(lanes)])
            t0 = time.perf_counter()
            cc = jax.jit(batched).lower(u0v).compile()
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            u, it = cc(u0v)
            chk = float(abs(u).sum())
            dt = time.perf_counter() - t0
            assert np.isfinite(chk)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                u, it = cc(u0v)
                chk = float(abs(u).sum())
                ts.append(time.perf_counter() - t0)
            log(f"probe vmap {lanes}-lane slab step: OK compile {tc:.0f}s "
                f"first {dt*1e3:.0f} ms median {np.median(ts)*1e3:.0f} ms "
                f"iters={np.asarray(it)}")
        except Exception as e:
            log(f"probe vmap {lanes}-lane FAILED: {type(e).__name__}: {e}")
            break

    # ---- probe 3: Pallas ELL contraction on hardware -----------------------
    try:
        from gmpnp_tpu.ops.ell_spmv import ell_block_contract_pallas

        N, K, f = 512, 16, 8
        key = jax.random.PRNGKey(0)
        blocks = jax.random.normal(key, (N, K, f, f), jnp.float32)
        xg = jax.random.normal(key, (N, K, f), jnp.float32)
        t0 = time.perf_counter()
        y = ell_block_contract_pallas(blocks, xg)
        y.block_until_ready()
        tc = time.perf_counter() - t0
        ref = jnp.einsum("nkfg,nkg->nf", blocks, xg)
        err = float(jnp.abs(y - ref).max())
        log(f"probe pallas ell_contract: OK compile+run {tc:.1f}s "
            f"maxerr={err:.2e}")
    except Exception as e:
        log(f"probe pallas ell_contract FAILED: {type(e).__name__}: {e}")

    # ---- probe 4: Pallas block inverse on hardware -------------------------
    try:
        from gmpnp_tpu.ops.block_gj import block_inv_pallas

        n, f = 512, 9
        key = jax.random.PRNGKey(1)
        A = jax.random.normal(key, (n, f, f), jnp.float32)
        A = A + 10.0 * jnp.eye(f, dtype=jnp.float32)
        t0 = time.perf_counter()
        Ainv = block_inv_pallas(A)
        Ainv.block_until_ready()
        tc = time.perf_counter() - t0
        err = float(jnp.abs(
            jnp.einsum("nfg,ngh->nfh", A, Ainv)
            - jnp.eye(f, dtype=jnp.float32)).max())
        log(f"probe pallas block_inv: OK compile+run {tc:.1f}s "
            f"maxerr={err:.2e}")
    except Exception as e:
        log(f"probe pallas block_inv FAILED: {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
