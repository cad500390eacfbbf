"""Round-3 probe: numeric forensics of the slab solve for 3D rxn-diff.

probe_r3_y showed the rxn_diff first implicit step at the shipped mesh
diverges ON TPU (Newton residual -> 2e5, GMRES polish maxed every
iteration) while converging in 5 Newton iterations on CPU —
and matmul precision 'highest' does NOT fix it.  This probe runs the
slab pipeline stage by stage on one Newton system and reports numeric
stats per stage, same code on both backends:

  assemble f64 -> equilibrate -> f32 bands -> block-Thomas factor ->
  f32 solve -> true f64 residual -> preconditioned GMRES

Run: python probes/probe_r3_z.py driver   (spawns tpu + cpu subprocesses)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

OUT = "/tmp/probe_r3_z.json"


def run_case(backend: str):
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.slab import (
        SlabPlan,
        slab_apply,
        slab_factor_fused,
        slab_prepare,
        slab_solve,
    )
    from gmpnp_tpu.solve.smallblock import block_inv

    cfg = pore_3d.Pore3DConfig(physics="rxn_diff", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N, nf = space.num_vertices, cfg.n_fields
    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot),
                          max_slabs=cfg.linear.max_slabs)
    print(f"dev {jax.devices()[0]} N={N} nf={nf} S={plan.S} m={plan.m}",
          flush=True)

    u0 = jnp.ones((N, nf))
    th = prog._theta_of_carry((u0, jnp.asarray(0.0)), jnp.asarray(0))
    bc = prog._bc_of_theta(th)
    u = bc.project(u0)

    def asm(u):
        ell = bc.apply_to_jacobian(space.jacobian(form, u, u0, th))
        r = bc.apply_to_residual(space.residual(form, u, u0, th), u)
        return ell, r

    ell, r = jax.jit(asm)(u)

    def stats(name, a):
        a = np.asarray(a)
        rec = {
            "finite_frac": float(np.isfinite(a).mean()),
            "max_abs": float(np.nanmax(np.abs(a[np.isfinite(a)]))
                             if np.isfinite(a).any() else np.nan),
        }
        print(f"  {name}: {rec}", flush=True)
        return rec

    out = {"backend": backend, "S": plan.S, "m": plan.m}
    out["r"] = stats("r(f64)", r)
    Dinv0 = jax.jit(lambda e: block_inv(e.diag_blocks()))(ell)
    out["Dinv0"] = stats("Dinv0", Dinv0)
    ell_eq = jax.jit(lambda e, D: e.scale_rows(D))(ell, Dinv0)
    out["ell_eq"] = stats("ell_eq", ell_eq.flat)
    b = jnp.einsum("nfg,ng->nf", Dinv0, r)

    factors = jax.jit(lambda e: slab_factor_fused(e, plan))(ell_eq)
    out["Dinv_f32"] = stats("factor.Dinv", factors.Dinv)
    out["Cp_f32"] = stats("factor.Cp", factors.Cp)

    def solve32(e, b):
        f = slab_factor_fused(e, plan)
        ds = plan.to_slabs(b.astype(jnp.float32))
        return plan.from_slabs(slab_solve(f, ds))

    x32 = jax.jit(solve32)(ell_eq, b)
    out["x32"] = stats("x32", x32)
    # true f64 relative residual of the f32 direct solve
    res = jax.jit(lambda e, x, b: e.matvec(x.astype(jnp.float64)) - b)(
        ell_eq, x32, b)
    rel = float(jnp.linalg.norm(res) / jnp.linalg.norm(b))
    out["f32_solve_rel_resid"] = rel
    print(f"  f32 direct solve rel residual: {rel:.3e}", flush=True)

    def gmres_apply(e, r):
        prep = slab_prepare(e, plan)
        res = slab_apply(prep, r, plan, tol=cfg.linear.tol,
                         max_refine=cfg.linear.max_refine)
        return res.x, res.resnorm, res.iters, res.converged

    x, rn, it, conv = jax.jit(gmres_apply)(ell, r)
    out["gmres"] = {"resnorm": float(rn), "iters": int(it),
                    "converged": bool(conv)}
    print(f"  gmres: {out['gmres']}", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    for backend in ("tpu", "cpu"):
        print(f"[z] === {backend} ===", flush=True)
        try:
            p = subprocess.run([sys.executable, here, backend],
                               capture_output=True, text=True, timeout=3000)
            outp = p.stdout + p.stderr
            got = None
            for line in outp.splitlines():
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])
                elif line.startswith("  "):
                    print("   " + line, flush=True)
            if got is None:
                tail = "\n".join(outp.splitlines()[-8:])
                got = {"error": f"rc={p.returncode}", "tail": tail[-600:]}
            results[backend] = got
        except subprocess.TimeoutExpired:
            results[backend] = {"error": "timeout"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("[z] done", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1])
