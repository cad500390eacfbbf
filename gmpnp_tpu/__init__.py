"""gmpnp_tpu — a TPU-native framework for generalized modified Poisson–Nernst–Planck
(GMPNP) electrochemistry simulations.

This package re-provides, from scratch and TPU-first (JAX/XLA/Pallas/pjit), the full
capability set of the reference GMPNP application (divyabohra/GMPNP): coupled
multi-species ion transport + electrostatics + finite-ion-size (steric) effects +
bicarbonate buffer chemistry for CO2 electroreduction, in 1D planar (EDL) and 3D
cylindrical-pore geometries — plus the finite-element machinery the reference
inherited from FEniCS/PETSc/MUMPS (meshing, assembly, Newton, sparse linear algebra,
distribution), rebuilt as jit-compiled JAX with Pallas kernels and
`jax.sharding`-based parallelism.

Layout
------
- ``constants``  : physical constants / species database (ref: utilities/parameters*.yaml)
- ``chem``       : homogeneous buffer kinetics, Henry/Sechenov gas solubility,
                   0D bulk-electrolyte equilibration (ref: utilities/bulk_soln.py)
- ``mesh``       : mesh data structures, DOLFIN-XML readers, graded-interval and
                   cylinder tet generators, boundary marking
- ``fem``        : P1 finite elements, weak-form kernels, assembly, Dirichlet BCs
- ``ops``        : Pallas TPU kernels for the hot paths
- ``solve``      : Newton, block-tridiagonal direct solves, GMRES/BiCGStab + preconditioners
- ``models``     : the five reference models as first-class configs
- ``parallel``   : vmapped parameter sweeps, shard_map domain decomposition
- ``io``         : npz/metadata/VTK writers, checkpointing
"""

__version__ = "0.1.0"

import jax as _jax

# Accuracy parity with the reference (FEniCS/PETSc runs in double precision)
# demands f64.  TPU emulates f64; models that can tolerate it may opt into
# f32 via config.  This must happen before any arrays are created.
_jax.config.update("jax_enable_x64", True)

# NOTE on matmul precision: f64 dots/einsums on TPU are exact at default
# precision (round-3 forensics: the f64 volume-Jacobian assembly matches
# CPU to 3.5e-12, probes/probe_r3_ab.py), so no global
# jax_default_matmul_precision override is needed.  f32 dots at default
# precision DO run bf16-grade passes on TPU (a well-conditioned m=1197
# D @ inv(D) check errs by 1.1 at default vs 6.1e-5 at HIGHEST); the f32
# code paths that care (the slab direct solver) request
# Precision.HIGHEST explicitly at their call sites (solve/slab.py).
