"""Round-3 probe: why the 3D rxn-diff step stalls Newton ON TPU ONLY.

At the shipped L_50_R_5 mesh (N=3,679), the rxn_diff first implicit
step converges in 5 Newton iterations on CPU but runs to the 50-iter
cap on TPU (finite residual — a stall, not a blow-up); the GMPNP
physics converges in 7 on the same mesh on TPU.  The 8-step bench scan
therefore executes 400 slab factorizations in one program and the
tunneled worker dies ("UNAVAILABLE: TPU worker process crashed").

Hypotheses probed, each in its own subprocess:
  base      — reproduce: newton/rn/linear_iters on TPU
  highest   — jax_default_matmul_precision='highest' (TPU f32 matmuls
              otherwise run bf16 MXU passes; if the stall is a
              bf16-degraded f32 factorization, this fixes it)
  refine80  — max_refine=80 (GMRES budget, if polish hits the 40 cap)
  gmpnp     — GMPNP contrast on the same mesh (sanity: 7 iters)

Run: python probes/probe_r3_y.py driver
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

CASES = ["base", "highest", "refine80", "gmpnp"]
OUT = "/tmp/probe_r3_y.json"


def run_case(case: str):
    import dataclasses

    import jax

    jax.config.update("jax_enable_x64", True)
    if case == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    physics = "GMPNP" if case == "gmpnp" else "rxn_diff"
    cfg = pore_3d.Pore3DConfig(physics=physics, L=50e-9, R=5e-9)
    if case == "refine80":
        cfg = dataclasses.replace(
            cfg, linear=dataclasses.replace(cfg.linear, max_refine=80))
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N, nf, ns = space.num_vertices, cfg.n_fields, len(cfg.species)
    print(f"device {jax.devices()[0]} N={N} nf={nf} case={case}", flush=True)

    u0 = jnp.ones((N, nf))
    if physics == "GMPNP":
        u0 = u0.at[:, ns].set(0.0)
    th = prog._theta_of_carry((u0, jnp.asarray(0.0)), jnp.asarray(0))
    step = make_implicit_step(space, form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)

    t0 = time.time()
    un, st = jax.jit(step)(u0, th)
    jax.block_until_ready(un)
    rec = {
        "case": case,
        "newton_iters": int(st.newton_iters),
        "converged": bool(st.converged),
        "residual_norm": float(st.residual_norm),
        "linear_iters": int(np.asarray(st.linear_iters).sum()),
        "wall_s": round(time.time() - t0, 1),
    }
    print("RESULT " + json.dumps(rec), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT))
        except Exception:
            results = {}
    for case in CASES:
        if case in results and "error" not in results[case]:
            print(f"[y] {case}: cached", flush=True)
            continue
        print(f"[y] === {case} ===", flush=True)
        try:
            p = subprocess.run([sys.executable, here, case],
                               capture_output=True, text=True, timeout=2400)
            out = p.stdout + p.stderr
            got = None
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])
            if got is None:
                tail = "\n".join(out.splitlines()[-8:])
                got = {"error": f"rc={p.returncode}", "tail": tail[-600:]}
            results[case] = got
            print(f"[y] {case}: {got}", flush=True)
        except subprocess.TimeoutExpired:
            results[case] = {"error": "timeout"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("[y] done", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1])
