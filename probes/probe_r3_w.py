"""Round-3 probe: Jacobian-assembly chunk size on TPU (the asm bottleneck).

probe_r3_v measured the production 3D Newton iteration at the shipped
mesh as asm 450 ms / equil 61 / factor 217 — ASSEMBLY dominates.  The
assembly runs jacfwd element Jacobians through lax.map over fixed
jac_chunk=128 chunks (C=17,297 tets -> 136 SEQUENTIAL chunk programs),
a footprint cap sized for 8-lane vmapped sweeps.  Production sweeps are
host-chunked single-lane since round 3, and one lane has the full 16 GB
HBM: larger chunks trade footprint for sequential latency.

Each case (one chunk size) runs in its own subprocess (OOM isolation):
times the asm phase alone and one full production step.

Run: python probes/probe_r3_w.py driver
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

CHUNKS = [128, 512, 2048, 8192, 17297]
OUT = "/tmp/probe_r3_w.json"


def run_case(chunk: int):
    import dataclasses

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space = dataclasses.replace(prog.space, jac_chunk=chunk)
    form = prog.form
    N, nf, ns = space.num_vertices, cfg.n_fields, len(cfg.species)
    print(f"device: {jax.devices()[0]}  N={N}  C={space.cells.shape[0]}  "
          f"chunk={chunk}", flush=True)

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    th = prog._theta_of_carry((u0, jnp.asarray(0.0)), jnp.asarray(0))
    bc = prog._bc_of_theta(th)
    u = bc.project(u0)

    def asm(u):
        ell = bc.apply_to_jacobian(space.jacobian(form, u, u0, th))
        r = bc.apply_to_residual(space.residual(form, u, u0, th), u)
        return ell, r

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
        return float(np.median(ts)) * 1e3

    ms_asm = timed(asm, u)

    step = make_implicit_step(space, form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)

    def one_step(u):
        u_new, st = step(u, th)
        return u_new, st.newton_iters

    ms_step = timed(one_step, u0, reps=3)
    print("RESULT " + json.dumps(
        {"chunk": chunk, "ms_asm": round(ms_asm, 1),
         "ms_step": round(ms_step, 1)}), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT))
        except Exception:
            results = {}
    for chunk in CHUNKS:
        key = str(chunk)
        if key in results and "error" not in results[key]:
            print(f"[w] {key}: cached", flush=True)
            continue
        print(f"[w] === chunk {chunk} ===", flush=True)
        try:
            p = subprocess.run([sys.executable, here, key],
                               capture_output=True, text=True, timeout=2400)
            out = p.stdout + p.stderr
            got = None
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])
            if got is None:
                tail = "\n".join(out.splitlines()[-8:])
                got = {"error": f"rc={p.returncode}", "tail": tail[-600:]}
            results[key] = got
            print(f"[w] {key}: {got}", flush=True)
        except subprocess.TimeoutExpired:
            results[key] = {"error": "timeout"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("[w] done", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "driver":
        driver()
    else:
        run_case(int(sys.argv[1]))
