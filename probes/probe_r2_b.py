"""Round-2 hardware probe B: assembly-cost breakdown and slab direct-solver
primitives at reference scale, plus re-checks of round-1 fault modes
(probe A showed the tunneled backend improved: re-execution works now).

Probes:
  1. residual assembly alone (pore GMPNP, generated L_50_R_5-size mesh)
  2. Jacobian: chunked jacfwd WITHOUT the global scatter
  3. Jacobian: the global scatter alone (precomputed element values)
  4. gather-based relayout ELL flat -> slab bands (S, m, 3m)
  5. jnp.linalg.inv f32 batched at slab size
  6. block-Thomas factor+solve prototype (scan, f32) at slab size
  7. vmapped 2-lane implicit step (round-1: faulted at every size)
  8. SSOR-in-Newton (round-1: Mosaic kernel fault)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[probe] {msg}", flush=True)


def timed(compiled, args, fetch=lambda out: float(abs(out).sum()),
          reps: int = 3):
    chk = fetch(compiled(*args))
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

    from gmpnp_tpu.models import pore_3d

    log(f"device: {jax.devices()[0]}")
    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    nf = cfg.n_fields
    ns = len(cfg.species)
    N = space.num_vertices
    C = space.cells.shape[0]
    K = space.adj.shape[1]
    log(f"mesh N={N} C={C} K={K} f={nf}")
    u0 = jnp.ones((N, nf), jnp.float64).at[:, ns].set(0.0)
    theta = {"dt": jnp.asarray(prog.dt_scaled),
             "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}

    # ---- probe 1: residual assembly --------------------------------------
    def resid(u):
        return space.residual(form, u, u, theta)

    cc = jax.jit(resid).lower(u0).compile()
    dt, _ = timed(cc, [u0])
    log(f"probe1 residual assembly: {dt*1e3:.1f} ms")

    # ---- probe 2: element jacfwd without scatter ---------------------------
    def jac_elems(u):
        def local_jac(ue, upe, g, v, x):
            fn = lambda uu: space._local_volume_residual(
                form, uu, upe, g, v, x, theta)
            J = jax.jacfwd(fn)(ue)
            return jnp.transpose(J, (0, 2, 1, 3)).reshape(-1)

        J_e = space._chunked_map(
            local_jac,
            [u[space.cells], u[space.cells],
             jnp.asarray(space.gradN), jnp.asarray(space.vols),
             jnp.asarray(space.xq)], C)
        return J_e

    cc2 = jax.jit(jac_elems).lower(u0).compile()
    dt2, _ = timed(cc2, [u0])
    log(f"probe2 element jacfwd (chunk={space.jac_chunk}): {dt2*1e3:.1f} ms")

    # ---- probe 3: the global scatter alone --------------------------------
    rows, cols = space._scatter_tables(np.asarray(space.cells),
                                       np.asarray(space.slot))
    J_e_const = np.random.default_rng(0).standard_normal(
        (C, rows.shape[1])).astype(np.float64)

    def scat(J_e):
        flat = jnp.zeros((N, nf * K * nf), dtype=J_e.dtype)
        return flat.at[rows, cols].add(J_e)

    cc3 = jax.jit(scat).lower(J_e_const).compile()
    dt3, _ = timed(cc3, [jnp.asarray(J_e_const)])
    log(f"probe3 global scatter alone: {dt3*1e3:.1f} ms")

    # ---- probe 3b: transpose-to-gather assembly ---------------------------
    # For each nonzero (row, col-slot) pair, gather its <=T element
    # contributions and sum: pure gather, no scatter.
    lin = rows.reshape(-1).astype(np.int64) * (nf * K * nf) + cols.reshape(-1)
    order = np.argsort(lin, kind="stable")
    lin_sorted = lin[order]
    uniq, start = np.unique(lin_sorted, return_index=True)
    counts = np.diff(np.append(start, len(lin_sorted)))
    T = int(counts.max())
    n_slots = len(uniq)
    src = np.full((n_slots, T), len(lin), dtype=np.int64)  # pad -> zero cell
    for t in range(T):
        sel = counts > t
        src[sel, t] = order[start[sel] + t]
    out_rows = (uniq // (nf * K * nf)).astype(np.int32)
    out_cols = (uniq % (nf * K * nf)).astype(np.int32)
    log(f"probe3b T={T} slots={n_slots}")

    def gath(J_e):
        Jf = jnp.concatenate([J_e.reshape(-1), jnp.zeros(1, J_e.dtype)])
        vals = Jf[src].sum(axis=1)                     # (n_slots,)
        flat = jnp.zeros((N, nf * K * nf), dtype=J_e.dtype)
        return flat.at[out_rows, out_cols].set(vals)

    cc3b = jax.jit(gath).lower(J_e_const).compile()
    dt3b, _ = timed(cc3b, [jnp.asarray(J_e_const)])
    log(f"probe3b gather assembly: {dt3b*1e3:.1f} ms")

    # ---- probe 4: ELL -> slab bands via pure gather ------------------------
    z = np.asarray(space.points)[:, -1]
    perm = np.argsort(z, kind="stable")
    iperm = np.empty(N, dtype=np.int64)
    iperm[perm] = np.arange(N)
    adj = np.asarray(space.adj)
    bw = int(np.abs(iperm[adj] - iperm[:, None][np.arange(N)][:, None]
                    * np.ones_like(adj)).max())
    bw = int(np.abs(iperm[adj] - iperm[np.arange(N)][:, None]).max())
    m_v = max(bw, 1)
    S = -(-N // m_v)
    m_v = -(-N // S)
    S = -(-N // m_v)
    m = m_v * nf
    log(f"probe4 bw={bw} S={S} m_v={m_v} m={m}")

    # build gather index: for each (s, i, j3) which ELL flat element feeds it
    Kf = K * nf
    flat_size = N * nf * Kf
    gidx = np.full((S, m, 3 * m), flat_size, dtype=np.int64)  # default: zero
    # ELL entry (n, r, k, c) -> value index n*nf*Kf + r*Kf + k*nf + c
    nn = np.arange(N)
    Ni = iperm[nn]
    s_of = Ni // m_v
    p_of = Ni % m_v
    for k in range(K):
        nj = adj[:, k]
        Njp = iperm[nj]
        sj = Njp // m_v
        pj = Njp % m_v
        band = sj - s_of
        ok = np.abs(band) <= 1
        # skip padded self-loop duplicates: keep only slot == diag_slot for
        # nj == nn
        is_dup = (nj == nn) & (np.arange(K)[k] != np.asarray(space.diag_slot))
        ok = ok & ~is_dup
        for r in range(nf):
            for c in range(nf):
                tgt_j = (band + 1) * m + pj * nf + c
                val_idx = nn * nf * Kf + r * Kf + k * nf + c
                gidx[s_of[ok], p_of[ok] * nf + r, tgt_j[ok]] = val_idx[ok]

    gidx_j = jnp.asarray(gidx.astype(np.int32))

    def relayout(flat32):
        src_vals = jnp.concatenate(
            [flat32.reshape(-1), jnp.zeros(1, flat32.dtype)])
        return src_vals[gidx_j].sum()

    flat32 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (N, nf, Kf)).astype(np.float32))
    cc4 = jax.jit(relayout).lower(flat32).compile()
    dt4, _ = timed(cc4, [flat32], fetch=float)
    log(f"probe4 gather relayout -> bands: {dt4*1e3:.1f} ms")

    # ---- probe 5: f32 batched inv at slab size ----------------------------
    rng = np.random.default_rng(2)
    Bd = jnp.asarray(rng.standard_normal((S, m, m)).astype(np.float32)
                     + 4 * m * np.eye(m, dtype=np.float32))

    def inv_all(Bd):
        return jnp.linalg.inv(Bd).sum()

    try:
        cc5 = jax.jit(inv_all).lower(Bd).compile()
        dt5, _ = timed(cc5, [Bd], fetch=float)
        log(f"probe5 batched inv (S={S}, m={m}) f32: {dt5*1e3:.1f} ms")
    except Exception as e:
        log(f"probe5 FAILED: {type(e).__name__}: {e}")

    # ---- probe 6: block-Thomas factor+solve prototype ---------------------
    Al = jnp.asarray(0.05 * rng.standard_normal((S, m, m)).astype(np.float32))
    Cu = jnp.asarray(0.05 * rng.standard_normal((S, m, m)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((S, m)).astype(np.float32))

    def thomas(Al, Bd, Cu, d):
        def fwd(Cp_prev, inp):
            A, B, C, di = inp
            denom = B - A @ Cp_prev
            Dinv = jnp.linalg.inv(denom)
            Cp = Dinv @ C
            return Cp, (Dinv, Cp)

        _, (Dinvs, Cps) = jax.lax.scan(
            fwd, jnp.zeros((m, m), jnp.float32), (Al, Bd, Cu, d))

        def fwd2(dp_prev, inp):
            Dinv, A, di = inp
            dp = Dinv @ (di - A @ dp_prev)
            return dp, dp

        _, dps = jax.lax.scan(fwd2, jnp.zeros(m, jnp.float32),
                              (Dinvs, Al, d))

        def bwd(x_next, inp):
            Cp, dp = inp
            x = dp - Cp @ x_next
            return x, x

        _, xs = jax.lax.scan(bwd, jnp.zeros(m, jnp.float32),
                             (Cps, dps), reverse=True)
        return xs.sum()

    try:
        cc6 = jax.jit(thomas).lower(Al, Bd, Cu, d).compile()
        dt6, _ = timed(cc6, [Al, Bd, Cu, d], fetch=float)
        log(f"probe6 block-Thomas factor+solve (S={S}, m={m}): "
            f"{dt6*1e3:.1f} ms")
    except Exception as e:
        log(f"probe6 FAILED: {type(e).__name__}: {e}")

    # ---- probe 7: vmapped 2-lane implicit step -----------------------------
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg7 = pore_3d.Pore3DConfig(physics="GMPNP", L=100e-9, R=10e-9,
                                mesh_resolution=(3, 24))
    prog7 = pore_3d.build(cfg7)
    nf7 = cfg7.n_fields
    ns7 = len(cfg7.species)
    step7 = make_implicit_step(prog7.space, prog7.form, cfg7.newton,
                               cfg7.linear, bc_of_theta=prog7._bc_of_theta)
    u07 = jnp.ones((2, prog7.space.num_vertices, nf7)).at[:, :, ns7].set(0.0)
    th7 = {"dt": jnp.asarray(prog7.dt_scaled),
           "co2_s1": jnp.asarray(prog7.eq_conc["CO2"]
                                 / prog7.bulk_conc["CO2"])}

    def two_lane(u0):
        u, st = jax.vmap(lambda u: step7(u, th7))(u0)
        return u, st.newton_iters

    try:
        cc7 = jax.jit(two_lane).lower(u07).compile()
        t0 = time.perf_counter()
        u7, it7 = cc7(u07)
        chk = float(abs(u7).sum())
        dt7 = time.perf_counter() - t0
        log(f"probe7 vmapped 2-lane step: OK {dt7*1e3:.0f} ms "
            f"iters={np.asarray(it7)} (round-1 fault is GONE)")
    except Exception as e:
        log(f"probe7 vmap step FAILED: {type(e).__name__}: {e}")

    # ---- probe 8: SSOR inside Newton ---------------------------------------
    from gmpnp_tpu.solve.timeloop import LinearConfig

    lin8 = LinearConfig(kind="bicgstab", tol=1e-6, maxiter=2000,
                        precond="ssor")
    step8 = make_implicit_step(prog7.space, prog7.form, cfg7.newton, lin8,
                               bc_of_theta=prog7._bc_of_theta)
    u08 = jnp.ones((prog7.space.num_vertices, nf7)).at[:, ns7].set(0.0)

    try:
        cc8 = jax.jit(step8).lower(u08, th7).compile()
        t0 = time.perf_counter()
        u8, st8 = cc8(u08, th7)
        chk = float(abs(u8).sum())
        dt8 = time.perf_counter() - t0
        log(f"probe8 SSOR-in-Newton step: OK {dt8*1e3:.0f} ms "
            f"newton={int(st8.newton_iters)} lin={int(st8.linear_iters)} "
            f"(round-1 fault is GONE)")
    except Exception as e:
        log(f"probe8 SSOR FAILED: {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
