"""Round-3 hardware probe B: bisect the per-lane-Dirichlet vmap fault at
N=3679 (probe_r3_a: BOTH the where/select and the pure-arithmetic BC
forms fault — the BC application kernel is NOT the trigger).

Known-good (probe_r2_l): 2-lane vmap, 8-step scan, per-lane co2_s1
(derived from the batched carry) on the SMALL s1 vertex set, CO2 field.
Known-bad (probe_r2_j, r3_a): same + per-lane voltage (a vmapped INPUT
axis) on the LARGE s2 wall set, potential field.

Variants isolate the three differences (value source / vertex set /
field index), plus a sequential-lanes fallback:

  base    : per-lane co2_s1 only (voltage lane-constant) — expect PASS
  volt    : + per-lane voltage from the input axis (the failing shape)
  volt_u  : voltage read from the batched carry (u0_l[0, P] seed trick)
            instead of the input axis — tests "input axis" as trigger
  volt_s1 : per-lane voltage applied to the SMALL s1 set, potential field
  volt_f0 : per-lane voltage applied to the s2 wall set but field 0 (H)
  seqmap  : the failing shape but lanes via lax.map (sequential, no vmap)
            — the fallback that would still give one compiled program per
            sweep if vmap stays broken

All variants use the pure-arithmetic BC.  Each case runs in its own
subprocess (driver mode).

Run: python probes/probe_r3_b.py driver > /tmp/probe_r3_b.log 2>&1
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def run_case(variant: str, lanes: int, steps: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    log(f"device: {jax.devices()[0]}  case: {variant} lanes={lanes} "
        f"steps={steps}")

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    N = prog.space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    s2 = np.unique(
        prog.mesh.facets[prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    def bc_of_theta(theta):
        bc = prog.bc.arith()
        bc = bc.set_value_arith(prog.s1_verts, prog.idx["CO2"],
                                theta["co2_s1"])
        if "voltage" in theta:
            if variant == "volt_s1":
                bc = bc.set_value_arith(prog.s1_verts, ns, theta["voltage"])
            elif variant == "volt_f0":
                bc = bc.set_value_arith(s2, 0, theta["voltage"])
            else:
                bc = bc.set_value_arith(s2, ns, theta["voltage"])
        return bc

    newton = dataclasses.replace(cfg.newton, loop="while")
    step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                              bc_of_theta=bc_of_theta)

    with_volt = variant != "base"

    def single(u0_l, voltage):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            if with_volt:
                th["voltage"] = voltage
            u_new, st = step(u, th)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0_l, jnp.asarray(0.0)), jnp.arange(steps))
        return u, iters

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    volts_np = np.linspace(-1.0, -2.5, lanes)

    if variant == "volt_u":
        # voltage carried in the batched array itself: lane l's voltage is
        # seeded into u0v[l, 0, ns] and read back — a DERIVED per-lane
        # scalar like co2_s1, not a vmapped input axis
        u0v = jnp.stack([u0.at[0, ns].set(v) for v in volts_np])

        def single_u(u0_l):
            v = u0_l[0, ns]
            return single(u0_l.at[0, ns].set(0.0), v)

        def run(u0v):
            return jax.vmap(single_u)(u0v)

        args = (u0v,)
    elif variant == "seqmap":
        u0v = jnp.stack([u0] * lanes)
        volts = jnp.asarray(volts_np)

        def run(u0v, volts):
            return jax.lax.map(lambda ab: single(ab[0], ab[1]),
                               (u0v, volts))

        args = (u0v, volts)
    else:
        u0v = jnp.stack([u0] * lanes)
        volts = jnp.asarray(volts_np)

        def run(u0v, volts):
            return jax.vmap(single)(u0v, volts)

        args = (u0v, volts)

    t0 = time.perf_counter()
    cc = jax.jit(run).lower(*args).compile()
    t_compile = time.perf_counter() - t0

    u, iters = cc(*args)
    chk = float(jnp.abs(u).sum())
    assert chk == chk, "non-finite"
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        u, iters = cc(*args)
        float(jnp.abs(u).sum())
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    res = {
        "variant": variant, "lanes": lanes, "steps": steps, "N": N,
        "compile_s": round(t_compile, 1),
        "ms_per_lane_step": round(dt / (lanes * steps) * 1e3, 1),
        "total_s": round(dt, 2),
        "newton_iters": np.asarray(iters).sum(axis=1).tolist(),
    }
    print("RESULT " + json.dumps(res), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}

    def spawn(variant, lanes=2, steps=8, timeout=3000):
        key = f"{variant}-{lanes}"
        log(f"=== spawning {key} ===")
        try:
            p = subprocess.run(
                [sys.executable, here, variant, str(lanes), str(steps)],
                capture_output=True, text=True, timeout=timeout)
            out = p.stdout + p.stderr
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[key] = json.loads(line[len("RESULT "):])
                    log(f"{key}: {results[key]}")
                    return True
            tail = "\n".join(out.splitlines()[-6:])
            log(f"{key}: FAILED rc={p.returncode}\n{tail}")
            results[key] = {"error": f"rc={p.returncode}"}
        except subprocess.TimeoutExpired:
            log(f"{key}: TIMEOUT")
            results[key] = {"error": "timeout"}
        finally:
            with open("/tmp/probe_r3_b_results.json", "w") as f:
                json.dump(results, f, indent=1)
        return False

    spawn("base")            # expect PASS (probe_r2_l shape)
    ok_u = spawn("volt_u")   # derived per-lane voltage
    spawn("volt_s1")         # small set, potential field
    spawn("volt_f0")         # wall set, non-potential field
    spawn("seqmap", lanes=4) # sequential-lane fallback
    if ok_u:
        spawn("volt_u", lanes=4)
        spawn("volt_u", lanes=8)
    log("driver done")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
