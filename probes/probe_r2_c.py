"""Round-2 hardware probe C: constant-vs-argument table handling on the
tunneled backend, gather-based assembly/relayout with device-resident
tables, slab-solver primitives, and vmap/SSOR fault re-checks.

Probe B died with HTTP 413 ("length limit exceeded") when a ~500 MB numpy
index table was closed over by jit: closure constants are embedded in the
compile request.  Everything here passes big tables as explicit arguments.
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

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # ---- probe 1: closure-constant vs argument compile cost ----------------
    M = 16_000_000                      # 64 MB int32 index table
    idx_np = rng.integers(0, 1000, size=M).astype(np.int32)
    src = jnp.asarray(rng.standard_normal(1000).astype(np.float32))

    t0 = time.perf_counter()
    cc = jax.jit(lambda s, i: s[i].sum()).lower(src, jnp.asarray(idx_np)
                                                ).compile()
    t_arg = time.perf_counter() - t0
    dt, _ = timed(cc, [src, jnp.asarray(idx_np)], fetch=float)
    log(f"probe1 64MB table as ARG: compile {t_arg:.1f}s exec {dt*1e3:.1f}ms")

    try:
        t0 = time.perf_counter()
        cc2 = jax.jit(lambda s: s[idx_np].sum()).lower(src).compile()
        t_const = time.perf_counter() - t0
        dt2, _ = timed(cc2, [src], fetch=float)
        log(f"probe1 64MB table as CLOSURE CONST: compile {t_const:.1f}s "
            f"exec {dt2*1e3:.1f}ms")
    except Exception as e:
        log(f"probe1 closure-const FAILED: {type(e).__name__}: {e}")

    # ---- build the FEM space (shared by the rest) ---------------------------
    from gmpnp_tpu.models import pore_3d

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    nf = cfg.n_fields
    N = space.num_vertices
    C = space.cells.shape[0]
    K = space.adj.shape[1]
    Kf = K * nf
    log(f"mesh N={N} C={C} K={K} f={nf}")

    # ---- probe 2: transpose-to-gather Jacobian scatter ---------------------
    rows, cols = space._scatter_tables(np.asarray(space.cells),
                                       np.asarray(space.slot))
    lin = rows.reshape(-1).astype(np.int64) * (nf * Kf) + cols.reshape(-1)
    order = np.argsort(lin, kind="stable")
    lin_sorted = lin[order]
    uniq, start = np.unique(lin_sorted, return_index=True)
    counts = np.diff(np.append(start, len(lin_sorted)))
    T = int(counts.max())
    n_slots = len(uniq)
    src_tab = np.full((n_slots, T), len(lin), dtype=np.int64)
    for t in range(T):
        sel = counts > t
        src_tab[sel, t] = order[start[sel] + t]
    log(f"probe2 T={T} slots={n_slots} "
        f"src_tab={src_tab.nbytes/1e6:.0f}MB(i64)")
    src_j = jnp.asarray(src_tab.astype(np.int32))
    uniq_j = jnp.asarray(uniq.astype(np.int32))

    J_e = jnp.asarray(rng.standard_normal((C, rows.shape[1])))

    def gath(J_e, src_j, uniq_j):
        Jf = jnp.concatenate([J_e.reshape(-1), jnp.zeros(1, J_e.dtype)])
        vals = Jf[src_j].sum(axis=1)
        flat = jnp.zeros(N * nf * Kf, dtype=J_e.dtype)
        return flat.at[uniq_j].set(vals)    # unique targets: pure set

    try:
        t0 = time.perf_counter()
        cc = jax.jit(gath).lower(J_e, src_j, uniq_j).compile()
        tc = time.perf_counter() - t0
        dt, _ = timed(cc, [J_e, src_j, uniq_j])
        log(f"probe2 gather-assembly f64: compile {tc:.0f}s exec "
            f"{dt*1e3:.1f} ms (scatter was 2269 ms)")
    except Exception as e:
        log(f"probe2 FAILED: {type(e).__name__}: {e}")

    # ---- probe 3: SlabPlan bands gather at reference size ------------------
    from gmpnp_tpu.solve.slab import SlabPlan, slab_factor, slab_solve

    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot))
    S, m = plan.S, plan.m
    log(f"probe3 bw={plan.bandwidth} S={S} m_v={plan.m_v} m={m} "
        f"gidx={np.asarray(plan.gidx).nbytes/1e6:.0f}MB")
    flat = jnp.asarray(rng.standard_normal((N, nf, Kf)))

    def bands(flat, gidx):
        vals = jnp.concatenate(
            [flat.astype(jnp.float32).reshape(-1), jnp.zeros(1, jnp.float32)])
        B = vals[gidx]
        ps, pi, pj = plan.pad_eye
        if len(ps):
            B = B.at[ps, pi, pj].set(1.0)
        return B[:, :, :m], B[:, :, m:2*m], B[:, :, 2*m:]

    try:
        t0 = time.perf_counter()
        cc = jax.jit(bands).lower(flat, plan.gidx).compile()
        tc = time.perf_counter() - t0
        dt, _ = timed(cc, [flat, plan.gidx],
                      fetch=lambda o: float(o[1][0, 0, 0]))
        log(f"probe3 band relayout: compile {tc:.0f}s exec {dt*1e3:.1f} ms")
    except Exception as e:
        log(f"probe3 FAILED: {type(e).__name__}: {e}")

    # ---- probe 4: slab factor+solve at reference size ----------------------
    lo = jnp.asarray(0.05 * rng.standard_normal((S, m, m)).astype(np.float32))
    up = jnp.asarray(0.05 * rng.standard_normal((S, m, m)).astype(np.float32))
    di = jnp.asarray((0.05 * rng.standard_normal((S, m, m))
                      + 4 * np.eye(m)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((S, m)).astype(np.float32))

    def fs(lo, di, up, d):
        fac = slab_factor(lo, di, up)
        return slab_solve(fac, d).sum()

    try:
        t0 = time.perf_counter()
        cc = jax.jit(fs).lower(lo, di, up, d).compile()
        tc = time.perf_counter() - t0
        dt, _ = timed(cc, [lo, di, up, d], fetch=float)
        log(f"probe4 slab factor+solve (S={S}, m={m}) f32: compile {tc:.0f}s "
            f"exec {dt*1e3:.1f} ms")
    except Exception as e:
        log(f"probe4 FAILED: {type(e).__name__}: {e}")

    # ---- probe 5: vmapped 2-lane implicit step ------------------------------
    from gmpnp_tpu.solve.timeloop import LinearConfig, make_implicit_step

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
        t0 = time.perf_counter()
        cc7 = jax.jit(two_lane).lower(u07).compile()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        u7, it7 = cc7(u07)
        chk = float(abs(u7).sum())
        dt7 = time.perf_counter() - t0
        log(f"probe5 vmapped 2-lane step: OK compile {tc:.0f}s exec "
            f"{dt7*1e3:.0f} ms iters={np.asarray(it7)}")
    except Exception as e:
        log(f"probe5 vmap step FAILED: {type(e).__name__}: {e}")

    # ---- probe 6: SSOR inside Newton ----------------------------------------
    lin8 = LinearConfig(kind="bicgstab", tol=1e-6, maxiter=2000,
                        precond="ssor")
    step8 = make_implicit_step(prog7.space, prog7.form, cfg7.newton, lin8,
                               bc_of_theta=prog7._bc_of_theta)
    u08 = jnp.ones((prog7.space.num_vertices, nf7)).at[:, ns7].set(0.0)

    try:
        t0 = time.perf_counter()
        cc8 = jax.jit(step8).lower(u08, th7).compile()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        u8, st8 = cc8(u08, th7)
        chk = float(abs(u8).sum())
        dt8 = time.perf_counter() - t0
        log(f"probe6 SSOR-in-Newton: OK compile {tc:.0f}s exec {dt8*1e3:.0f} "
            f"ms newton={int(st8.newton_iters)} lin={int(st8.linear_iters)}")
    except Exception as e:
        log(f"probe6 SSOR FAILED: {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
