"""The five reference models as first-class configs.

Each model module exposes a Config dataclass, a ``build(config)`` returning a
compiled program, and a ``run(config)`` convenience producing the
reference-compatible outputs (npz/metadata).

Model <-> reference map:
- rxn_diff_1d : 1D/rxn_diff_planar.py       (solve_rxn_diff)
- edl_1d      : 1D/MPNP_CO2ER_EDL.py        (solve_EDL, PNP & MPNP)
- stern       : 1D/Stern_CO2ER.py           (main/Stern, BDM & linear)
- pore_3d     : 3D/MPNP_CO2ER_pore.py       (solveEDL, GMPNP)
- rxn_diff_3d : 3D/rxn_diff_CO2ER_pore.py   (solveEDL, neutral transport)
"""
