"""Round-3 probe: bisect the TPU Jacobian-assembly error for 3D rxn_diff.

probe_r3_z/aa forensics: at the shipped L_50_R_5 mesh the rxn_diff
RESIDUAL assembly matches CPU to 1e-14 on TPU, but the JACOBIAN diag
blocks differ by 0.149 max-abs (~15% of O(1) entries), block_inv and
the slab factorization are fine, and matmul precision (local or global
``jax_default_matmul_precision=highest``) changes nothing.  The MPNP
physics (no boundary terms in F — the faithful orphaned-flux quirk)
converges on TPU; rxn_diff (wall + Robin exit fluxes in F) diverges.

This probe separates the two Jacobian contributions per backend:
  1. volume-only Jacobian (WeakForm with boundary={})
  2. full Jacobian (volume + facet scatter-add)
  3. facet contribution = full - volume (both paths are linear)
and checks each backend's J against a central finite difference of its
OWN residual (the ground truth that backend's Newton actually needs).

Run: python probes/probe_r3_ab.py driver
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

OUT = "/tmp/probe_r3_ab.json"
CPU_NPZ = "/tmp/probe_r3_ab_cpu.npz"


def run_case(backend: str, physics: str):
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.fem.forms import WeakForm
    from gmpnp_tpu.models import pore_3d

    cfg = pore_3d.Pore3DConfig(physics=physics, L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N, nf = space.num_vertices, cfg.n_fields
    print(f"dev {jax.devices()[0]} {physics} N={N} nf={nf}", flush=True)

    u0 = jnp.ones((N, nf))
    th = prog._theta_of_carry((u0, jnp.asarray(0.0)), jnp.asarray(0))
    bc = prog._bc_of_theta(th)
    u = bc.project(u0)

    vol_form = WeakForm(nf, form.volume)  # boundary={}

    J_full = jax.jit(
        lambda u: space.jacobian(form, u, u0, th).flat)(u)
    J_vol = jax.jit(
        lambda u: space.jacobian(vol_form, u, u0, th).flat)(u)
    r_fn = jax.jit(lambda u: space.residual(form, u, u0, th))

    # FD consistency of this backend's J vs this backend's residual
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.standard_normal((N, nf)))
    eps = 1e-6
    fd = (r_fn(u + eps * v) - r_fn(u - eps * v)) / (2 * eps)
    from gmpnp_tpu.fem.assembly import BlockELL
    ell = BlockELL(adj=space.adj, flat=J_full, diag_slot=space.diag_slot)
    Jv = jax.jit(lambda e, v: e.matvec(v))(ell, v)
    fd_err = float(jnp.linalg.norm(Jv - fd) / jnp.linalg.norm(fd))

    out = {"backend": backend, "physics": physics, "fd_rel_err": fd_err}
    print(f"  FD consistency rel err: {fd_err:.3e}", flush=True)

    if backend == "cpu":
        np.savez(CPU_NPZ + "." + physics,
                 J_full=np.asarray(J_full), J_vol=np.asarray(J_vol))
    else:
        ref = np.load(CPU_NPZ + "." + physics + ".npz")
        d_full = float(np.abs(np.asarray(J_full) - ref["J_full"]).max())
        d_vol = float(np.abs(np.asarray(J_vol) - ref["J_vol"]).max())
        fac_t = np.asarray(J_full) - np.asarray(J_vol)
        fac_c = ref["J_full"] - ref["J_vol"]
        d_fac = float(np.abs(fac_t - fac_c).max())
        out.update({"maxdiff_full": d_full, "maxdiff_vol": d_vol,
                    "maxdiff_facet": d_fac,
                    "facet_scale": float(np.abs(fac_c).max())})
        print(f"  vs CPU: full {d_full:.3e}  vol {d_vol:.3e}  "
              f"facet {d_fac:.3e} (facet scale {out['facet_scale']:.3e})",
              flush=True)
    print("RESULT " + json.dumps(out), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    for physics in ("rxn_diff", "GMPNP"):
        for backend in ("cpu", "tpu"):
            key = f"{physics}/{backend}"
            print(f"[ab] === {key} ===", flush=True)
            try:
                p = subprocess.run([sys.executable, here, backend, physics],
                                   capture_output=True, text=True,
                                   timeout=3000)
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
                results[key] = got
            except subprocess.TimeoutExpired:
                results[key] = {"error": "timeout"}
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
    print("[ab] done", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1], sys.argv[2])
