"""Round-2 hardware probe A: re-validate the round-1 TPU constraints and
measure the primitives for the planned z-slab block-tridiagonal direct
solver (docs/TPU_NOTES.md records the round-1 findings this re-tests).

Probes, ordered safest -> riskiest (a kernel fault kills the process, so
later probes must not mask earlier results; every result prints before the
next probe starts):

  1. re-execution: does running the SAME compiled program twice still fault
     the tunneled worker?  (round 1: yes)
  2. f32 batched LU: jnp.linalg.solve on (S, m, m) f32 — the factorization
     primitive of the planned direct solver (round-1 note says f64 LU is
     unimplemented on TPU; f32 should work).
  3. block-ELL matvec timing at reference size N=3679, f64 vs f32
     (round 1: 1.7 ms vs 0.14 ms at N=925).
  4. static scatter-add relayout BlockELL -> slab banded blocks at N=3679.
  5. Jacobian assembly at N~3679 (round 1: faults — the N>~3k threshold).

Run on the TPU:  python probes/probe_r2_a.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[probe] {msg}", flush=True)


def timed(compiled, args, fetch=lambda out: float(abs(out).sum()),
          reps: int = 5):
    """Warm-up once, then median of ``reps`` timed executions (each ending
    in a value fetch — block_until_ready does not surface async faults on
    the tunneled backend, docs/TPU_NOTES.md)."""
    chk = fetch(compiled(*args))          # warm-up
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chk = fetch(compiled(*args))
        ts.append(time.perf_counter() - t0)
    assert chk == chk, "non-finite"
    return float(np.median(ts)), chk


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    # ---- probe 1: re-execution fault --------------------------------------
    x = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda a: (a @ a).sum() + 1.0)
    c = f.lower(x).compile()
    v1 = float(c(x))
    log(f"probe1 first exec ok ({v1:.1f})")
    try:
        v2 = float(c(x))
        log(f"probe1 REEXEC OK ({v2:.1f}) — round-1 fault is GONE")
    except Exception as e:
        log(f"probe1 reexec FAILED: {type(e).__name__}: {e}")
        log("probe1 aborting process (worker likely dead)")
        sys.exit(0)

    # ---- probe 2: f32 batched LU solve ------------------------------------
    S, m = 8, 512
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((S, m, m)).astype(np.float32)
                    + m * np.eye(m, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((S, m)).astype(np.float32))

    def lu_loop(A, b):
        def body(i, acc):
            x = jnp.linalg.solve(A + acc * 0.0,
                                 b[..., None]).squeeze(-1)
            return acc + x.sum() * 1e-20
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

    try:
        cc = jax.jit(lu_loop).lower(A, b).compile()
        dt, chk = timed(cc, [A, b], fetch=float)
        log(f"probe2 f32 LU solve (S={S}, m={m}) x10: {dt*1e3:.1f} ms total "
            f"-> {dt*1e2:.2f} ms/solve-batch ok")
    except Exception as e:
        log(f"probe2 f32 LU FAILED: {type(e).__name__}: {e}")

    # ---- probe 3: matvec timing at N=3679, f64 vs f32 ---------------------
    N, fdim, K = 3679, 9, 16
    adj = np.minimum(
        np.arange(N)[:, None] + np.arange(K)[None, :], N - 1).astype(np.int32)

    def run_matvec(flat, x, adj, iters=100):
        Kf = flat.shape[2]

        def body(i, x):
            xg = x[adj].reshape(N, Kf)
            y = jax.lax.dot_general(
                flat, xg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=x.dtype)
            return y * (1.0 / (1.0 + jnp.abs(y).max()))

        return jax.lax.fori_loop(0, iters, body, x)

    for dt_name, dtype in [("f32", np.float32), ("f64", np.float64)]:
        flat = jnp.asarray(
            rng.standard_normal((N, fdim, K * fdim)).astype(dtype) / K)
        xv = jnp.asarray(rng.standard_normal((N, fdim)).astype(dtype))
        try:
            cc = jax.jit(
                lambda fl, xx: run_matvec(fl, xx, adj)).lower(flat, xv).compile()
            dts, chk = timed(cc, [flat, xv])
            log(f"probe3 matvec N={N} {dt_name}: {dts*1e3/100:.3f} ms/matvec "
                f"({dts*1e3:.1f} ms /100)")
        except Exception as e:
            log(f"probe3 {dt_name} FAILED: {type(e).__name__}: {e}")

    # ---- probe 4: BlockELL -> slab-banded scatter relayout ----------------
    # synthetic z-slab structure: S slabs of m_v vertices each
    S4 = 32
    m_v = -(-N // S4)               # vertices per slab (padded)
    mb = m_v * fdim                 # block size in dofs
    slab = np.minimum(np.arange(N) // m_v, S4 - 1)
    pos = np.arange(N) - slab * m_v
    # target index arrays for every (n, r, k, c) entry of flat
    nn = np.arange(N)[:, None, None, None]
    rr = np.arange(fdim)[None, :, None, None]
    kk = np.arange(K)[None, None, :, None]
    ccidx = np.arange(fdim)[None, None, None, :]
    adj_slab = slab[adj]            # (N, K)
    adj_pos = pos[adj]
    srow = np.broadcast_to(slab[:, None, None, None],
                           (N, fdim, K, fdim)).reshape(-1)
    prow = np.broadcast_to((pos[:, None] * fdim + np.arange(fdim))[
        :, :, None, None], (N, fdim, K, fdim)).reshape(-1)
    band = adj_slab[nn, kk] - slab[nn]  # -1/0/+1 (clip others to diag dup 0)
    band = np.clip(band, -1, 1)
    pcol = ((band + 1) * mb
            + adj_pos[nn, kk] * fdim + ccidx)
    pcol = np.broadcast_to(pcol, (N, fdim, K, fdim)).reshape(-1)
    srow_j = jnp.asarray(srow.astype(np.int32))
    prow_j = jnp.asarray(prow.astype(np.int32))
    pcol_j = jnp.asarray(pcol.astype(np.int32))

    def relayout(flat):
        vals = flat.reshape(N, fdim, K, fdim).reshape(-1)
        B = jnp.zeros((S4, mb, 3 * mb), flat.dtype)
        return B.at[srow_j, prow_j, pcol_j].add(vals).sum()

    flat32 = jnp.asarray(rng.standard_normal(
        (N, fdim, K * fdim)).astype(np.float32))
    try:
        cc = jax.jit(relayout).lower(flat32).compile()
        dts, chk = timed(cc, [flat32], fetch=float)
        log(f"probe4 scatter relayout (S={S4}, mb={mb}): {dts*1e3:.2f} ms ok")
    except Exception as e:
        log(f"probe4 FAILED: {type(e).__name__}: {e}")

    # ---- probe 5: Jacobian assembly at reference size ---------------------
    log("probe5 building pore FemSpace at L_50_R_5 size...")
    from gmpnp_tpu.models import pore_3d

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    nf = cfg.n_fields
    ns = len(cfg.species)
    Nn = space.num_vertices
    log(f"probe5 mesh N={Nn} cells={space.cells.shape[0]}")
    u0 = jnp.ones((Nn, nf), jnp.float64).at[:, ns].set(0.0)
    theta = {"dt": jnp.asarray(prog.dt_scaled),
             "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}

    def assemble(u):
        ell = space.jacobian(form, u, u, theta)
        return ell.flat

    try:
        cc = jax.jit(assemble).lower(u0).compile()
        dts, chk = timed(cc, [u0])
        log(f"probe5 jacobian assembly N={Nn}: {dts*1e3:.1f} ms ok")
    except Exception as e:
        log(f"probe5 FAILED: {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
