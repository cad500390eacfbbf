"""Command-line entrypoints mirroring the reference scripts' argparse flags.

    python -m gmpnp_tpu.cli.edl_1d       ~  python 1D/MPNP_CO2ER_EDL.py
    python -m gmpnp_tpu.cli.rxn_diff_1d  ~  python 1D/rxn_diff_planar.py
    python -m gmpnp_tpu.cli.stern        ~  python 1D/Stern_CO2ER.py
    python -m gmpnp_tpu.cli.pore_3d      ~  python 3D/MPNP_CO2ER_pore.py
    python -m gmpnp_tpu.cli.rxn_diff_3d  ~  python 3D/rxn_diff_CO2ER_pore.py
    python -m gmpnp_tpu.cli.bulk_soln    ~  python utilities/bulk_soln.py
    python -m gmpnp_tpu.cli.mesh_tests   ~  python 3D/mesh_tests.py
    python -m gmpnp_tpu.cli.sweep        (framework extra: vmapped sweeps)

Flag names and defaults track the reference CLIs (cited per module); the
hardcoded machine-specific basepaths are replaced by ``--out_root`` /
``GMPNP_OUT`` and ``GMPNP_UTILITIES``.
"""
