"""Round-3 study: TPU scaling envelope (VERDICT r2 item 6).

One table that turns round-2's point measurements into a scaling story:

Part A — single-config 3D GMPNP transient, ms/step vs mesh size N:
  gen (3,24)   N=925     (round-2 sweep stand-in mesh)
  gen (3,40)   N~2.4k
  shipped L_50_R_5  N=3,679  (the reference headline mesh)
  gen (4,48)   N~4.3k    (round-2 beyond-reference size)
  gen (5,64)   N~7-9k    (hunting the next VMEM wall)
  gen (6,96)   N~15-20k  (expected past the wall; records the failure)

Part B — config-5 sweep, ms/lane-step vs lanes at the SHIPPED N=3,679
mesh, host-chunked (the production large-mesh mode): lanes 1/2/4/8.
Expected flat ms/lane-step (one lane saturates the chip; throughput
scales linearly in wall-clock).

Every case runs in its own subprocess (worker-crash isolation); results
appended to /tmp/study_r3_scaling.json as they land.

Run: python probes/study_r3_scaling.py driver > /tmp/study_scaling.log 2>&1
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

STEPS = 8
OUT = "/tmp/study_r3_scaling.json"


def log(msg):
    print(f"[study] {msg}", flush=True)


def run_case(kind: str, arg: str):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.fem.dirichlet import ArithDirichletBC
    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    log(f"device: {jax.devices()[0]}  case: {kind}/{arg}")

    if kind == "size":
        # arg: 'shipped' or 'a,z' generated resolution
        if arg == "shipped":
            cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
        else:
            a, z = (int(x) for x in arg.split(","))
            os.environ.pop("GMPNP_UTILITIES", None)
            cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9,
                                       mesh_resolution=(a, z))
        prog = pore_3d.build(cfg)
        N = prog.space.num_vertices
        nf, ns = cfg.n_fields, len(cfg.species)
        step = make_implicit_step(prog.space, prog.form, cfg.newton,
                                  cfg.linear, bc_of_theta=prog._bc_of_theta)

        def run(u0):
            def body(carry, i):
                u, extra = carry
                th = prog._theta_of_carry((u, extra), i)
                u_new, st = step(u, th)
                return (u_new, extra), st.newton_iters

            (u, _), iters = jax.lax.scan(
                body, (u0, jnp.asarray(0.0)), jnp.arange(STEPS))
            return u, iters

        u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
        t0 = time.perf_counter()
        cc = jax.jit(run).lower(u0).compile()
        t_compile = time.perf_counter() - t0
        u, iters = cc(u0)
        assert np.isfinite(float(jnp.abs(u).sum()))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            u, iters = cc(u0)
            float(jnp.abs(u).sum())
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        res = {"kind": kind, "arg": arg, "N": N, "steps": STEPS,
               "compile_s": round(t_compile, 1),
               "ms_per_step": round(dt / STEPS * 1e3, 1),
               "newton_iters": int(np.asarray(iters).sum())}
        print("RESULT " + json.dumps(res), flush=True)
        return

    if kind == "lanes":
        lanes = int(arg)
        cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
        prog = pore_3d.build(cfg)
        N = prog.space.num_vertices
        nf, ns = cfg.n_fields, len(cfg.species)
        s2 = np.unique(prog.mesh.facets[
            prog.mesh.facet_markers == pore_3d.S2].reshape(-1))
        base_bc = prog.bc.arith()
        oh_co2 = np.zeros((N, nf))
        oh_co2[prog.s1_verts, prog.idx["CO2"]] = 1.0
        oh_v = np.zeros((N, nf))
        oh_v[s2, ns] = 1.0

        def bc_of_theta(theta):
            vals = (base_bc.values * (1.0 - oh_co2)
                    + theta["co2_s1"] * oh_co2)
            vals = vals * (1.0 - oh_v) + theta["voltage"] * oh_v
            vals = jax.lax.optimization_barrier(vals)
            return ArithDirichletBC(base_bc.mask, base_bc.maskf, vals)

        newton = dataclasses.replace(cfg.newton, loop="while")
        step = make_implicit_step(prog.space, prog.form, newton,
                                  cfg.linear, bc_of_theta=bc_of_theta)

        def single(u0_l, voltage):
            def body(carry, i):
                u, extra = carry
                th = prog._theta_of_carry((u, extra), i)
                th["voltage"] = voltage
                u_new, st = step(u, th)
                return (u_new, extra), st.newton_iters

            (u, _), iters = jax.lax.scan(
                body, (u0_l, jnp.asarray(0.0)), jnp.arange(STEPS))
            return u, iters

        u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
        # the reference's 3D operating regime (bench.py _build_pore_sweep):
        # cold starts beyond ~-1.5 exceed backward Euler's convergence
        # basin on the shipped mesh (the first -1.0..-2.5 attempt faulted
        # the worker at the -2.5 lane) — scaling-vs-lanes is measured on
        # healthy lanes
        volts = np.linspace(-0.25, -1.0, lanes)
        t0 = time.perf_counter()
        cc = jax.jit(single).lower(u0, jnp.asarray(volts[0])).compile()
        t_compile = time.perf_counter() - t0
        tot_newton = 0
        for v in volts:                    # warm-up all lanes
            u, iters = cc(u0, jnp.asarray(v))
            assert np.isfinite(float(jnp.abs(u).sum()))
            tot_newton += int(np.asarray(iters).sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for v in volts:
                u, iters = cc(u0, jnp.asarray(v))
                float(jnp.abs(u).sum())
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        res = {"kind": kind, "lanes": lanes, "N": N, "steps": STEPS,
               "mode": "host-chunked",
               "compile_s": round(t_compile, 1),
               "ms_per_lane_step": round(dt / (lanes * STEPS) * 1e3, 1),
               "total_s": round(dt, 2),
               "newton_iters": tot_newton}
        print("RESULT " + json.dumps(res), flush=True)
        return

    raise ValueError(kind)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT))
        except Exception:
            results = {}

    def spawn(kind, arg, timeout=3600):
        key = f"{kind}/{arg}"
        if key in results and "error" not in results[key]:
            log(f"{key}: cached")
            return True
        log(f"=== spawning {key} ===")
        try:
            p = subprocess.run([sys.executable, here, kind, arg],
                               capture_output=True, text=True,
                               timeout=timeout)
            out = p.stdout + p.stderr
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[key] = json.loads(line[len("RESULT "):])
                    log(f"{key}: {results[key]}")
                    return True
            tail = "\n".join(out.splitlines()[-12:])
            log(f"{key}: FAILED rc={p.returncode}\n{tail}")
            results[key] = {"error": f"rc={p.returncode}",
                            "tail": tail[-800:]}
        except subprocess.TimeoutExpired:
            log(f"{key}: TIMEOUT")
            results[key] = {"error": "timeout"}
        finally:
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
        return False

    # Part A small to large; the last entries may fault — run them late
    spawn("size", "3,24")
    spawn("size", "3,40")
    spawn("size", "shipped")
    spawn("size", "4,48")
    # Part B lanes at the shipped mesh (reuses the single-lane shape)
    spawn("lanes", "1")
    spawn("lanes", "2")
    spawn("lanes", "4")
    spawn("lanes", "8", timeout=4200)
    # VMEM-wall hunt last (may crash the worker)
    spawn("size", "5,64")
    spawn("size", "6,96", timeout=4200)
    log("driver done")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1], sys.argv[2])
