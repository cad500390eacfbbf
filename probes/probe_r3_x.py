"""Round-3 probe: slab factorization Thomas vs cyclic reduction on TPU.

probe_r3_v put the production Newton iteration at the shipped mesh at
asm 450 / equil 61 / factor 217 ms.  The factor is a lax.scan of S~22
SEQUENTIAL steps, each inverting one m~1539 dense block — a single
inverse that size is panel-sequential and starves the MXU, so the phase
is latency-bound (~10 ms/slab vs ~0.3 ms of pure f32 FLOPs).  Block
cyclic reduction at slab granularity (solve/slab.py slab_factor_cr)
replaces them with ceil(log2 S)=5 levels of BATCHED inversions; the
solve drops from 2S sequential scan steps to 2*log2(S) batched stages
(GMRES polish applies get faster too).  ~3x the matmul FLOPs — which
are nearly free here.

Each mode runs in its own subprocess: times factor, one preconditioner
apply, one full cold step, and an 8-step warm window.

Run: python probes/probe_r3_x.py driver
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

MODES = ["thomas", "cr"]
OUT = "/tmp/probe_r3_x.json"


def run_case(mode: str):
    import dataclasses

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.slab import (
        slab_apply,
        slab_factor_cr_fused,
        slab_factor_fused,
        slab_prepare,
    )
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    cfg = dataclasses.replace(
        cfg, linear=dataclasses.replace(cfg.linear, slab_mode=mode))
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N, nf, ns = space.num_vertices, cfg.n_fields, len(cfg.species)

    from gmpnp_tpu.solve.slab import SlabPlan
    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot),
                          max_slabs=cfg.linear.max_slabs)
    print(f"device: {jax.devices()[0]}  N={N}  S={plan.S}  m={plan.m}  "
          f"mode={mode}", flush=True)

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    th = prog._theta_of_carry((u0, jnp.asarray(0.0)), jnp.asarray(0))
    bc = prog._bc_of_theta(th)
    u = bc.project(u0)

    def asm(u):
        ell = bc.apply_to_jacobian(space.jacobian(form, u, u0, th))
        r = bc.apply_to_residual(space.residual(form, u, u0, th), u)
        return ell, r

    ell, r = jax.jit(asm)(u)
    jax.block_until_ready(ell.flat)

    def timed(fn, *args, reps=5):
        cc = jax.jit(fn).lower(*args).compile()
        out = cc(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = cc(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return out, float(np.median(ts)) * 1e3

    factor = slab_factor_cr_fused if mode == "cr" else slab_factor_fused

    def do_factor(ell):
        return factor(ell, plan)

    _, ms_factor = timed(do_factor, ell)
    print(f"  factor[{mode}]: {ms_factor:.1f} ms", flush=True)

    def do_solve(ell, r):
        prep = slab_prepare(ell, plan, mode=mode)
        res = slab_apply(prep, r, plan, tol=cfg.linear.tol,
                         max_refine=cfg.linear.max_refine)
        return res.x, res.iters

    (_, iters), ms_solve = timed(do_solve, ell, r)
    print(f"  prepare+polish[{mode}]: {ms_solve:.1f} ms  "
          f"gmres_iters={int(iters)}", flush=True)

    step = make_implicit_step(space, form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)

    def one_step(u):
        u_new, st = step(u, th)
        return u_new, st.newton_iters

    (_, ni), ms_cold = timed(one_step, u0, reps=3)
    print(f"  cold step[{mode}]: {ms_cold:.1f} ms  newton={int(ni)}",
          flush=True)

    def window(u0):
        def body(carry, i):
            u, t = carry
            thi = prog._theta_of_carry((u, t), i)
            u_new, st = step(u, thi)
            return (u_new, t), st.newton_iters
        (uf, _), it = jax.lax.scan(body, (u0, jnp.asarray(0.0)),
                                   jnp.arange(8))
        return uf, it

    (uf, it), ms_win = timed(window, u0, reps=3)
    chk = float(jnp.abs(uf).sum())
    assert np.isfinite(chk)
    print("RESULT " + json.dumps(
        {"mode": mode, "S": plan.S, "m": plan.m,
         "ms_factor": round(ms_factor, 1),
         "ms_prep_polish": round(ms_solve, 1),
         "gmres_iters": int(iters),
         "ms_cold_step": round(ms_cold, 1),
         "ms_per_step_8win": round(ms_win / 8, 1),
         "newton_iters_8win": int(np.asarray(it).sum()),
         "checksum": chk}), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT))
        except Exception:
            results = {}
    for mode in MODES:
        if mode in results and "error" not in results[mode]:
            print(f"[x] {mode}: cached", flush=True)
            continue
        print(f"[x] === {mode} ===", flush=True)
        try:
            p = subprocess.run([sys.executable, here, mode],
                               capture_output=True, text=True, timeout=3000)
            out = p.stdout + p.stderr
            got = None
            for line in out.splitlines():
                print("   ", line[:120], flush=True)
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])
            if got is None:
                tail = "\n".join(out.splitlines()[-8:])
                got = {"error": f"rc={p.returncode}", "tail": tail[-600:]}
            results[mode] = got
        except subprocess.TimeoutExpired:
            results[mode] = {"error": "timeout"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("[x] done", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1])
