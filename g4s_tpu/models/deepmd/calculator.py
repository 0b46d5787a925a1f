"""ASE calculator interface (deepmd/infer/calculator.py DP class).

The reference exposes frozen models to ASE via a Calculator subclass.
ase is not bundled in this image, so the class is defined lazily: it
works when ase is importable and raises a clear ImportError otherwise.
The evaluation path (DeepPot.eval on positions/cell/types) is identical
either way and is tested through `calc_ase_free` below without ase.
"""

from __future__ import annotations

import numpy as np

from g4s_tpu.models.deepmd.infer import DeepPot

# eV/Angstrom units are native to the training data; no conversion needed
__all__ = ["DP", "calc_ase_free"]


def calc_ase_free(model_file, positions, cell, symbols, type_map):
    """ASE-free evaluation with the calculator's conventions:
    positions (N,3) Angstrom, cell (3,3), symbols list of element names,
    type_map list mapping type index -> element. Returns dict with
    energy (eV), forces (N,3) eV/A, virial (3,3)."""
    dp = DeepPot(model_file)
    types = np.asarray([type_map.index(s) for s in symbols], np.int32)
    e, f, v = dp.eval(np.asarray(positions, np.float64),
                      np.asarray(cell, np.float64), types)
    return {"energy": float(np.asarray(e)),
            "forces": np.asarray(f),
            "virial": np.asarray(v)}


def _make_dp_class():
    from ase.calculators.calculator import Calculator, all_changes

    class DP(Calculator):
        """ASE Calculator backed by a frozen model (reference DP class,
        deepmd/infer/calculator.py:33)."""

        name = "DP"
        implemented_properties = ["energy", "free_energy", "forces",
                                  "virial", "stress"]

        def __init__(self, model, label="DP", type_dict=None, **kwargs):
            Calculator.__init__(self, label=label, **kwargs)
            self.dp = DeepPot(model)
            if type_dict:
                self.type_dict = type_dict
            else:
                self.type_dict = {s: i for i, s in
                                  enumerate(self.dp.type_map)}

        def calculate(self, atoms=None, properties=("energy", "forces"),
                      system_changes=all_changes):
            if atoms is not None:
                self.atoms = atoms.copy()
            coord = self.atoms.get_positions()
            cell = np.asarray(self.atoms.get_cell())
            symbols = self.atoms.get_chemical_symbols()
            atype = np.asarray([self.type_dict[k] for k in symbols],
                               np.int32)
            e, f, v = self.dp.eval(coord, cell, atype)
            self.results["energy"] = float(np.asarray(e))
            self.results["free_energy"] = float(np.asarray(e))
            self.results["forces"] = np.asarray(f)
            self.results["virial"] = np.asarray(v).reshape(3, 3)
            if "stress" in properties:
                vol = abs(np.linalg.det(cell))
                # ASE Voigt order xx yy zz yz xz xy, sign per ASE docs
                W = np.asarray(v).reshape(3, 3)
                stress = -0.5 * (W + W.T) / vol
                self.results["stress"] = stress[[0, 1, 2, 1, 0, 0],
                                                [0, 1, 2, 2, 2, 1]]

    return DP


try:
    DP = _make_dp_class()
except ImportError:
    class DP:   # type: ignore[no-redef]
        """Placeholder when ase is unavailable: install ase to use, or
        call calc_ase_free for the same evaluation without ase."""

        def __init__(self, *a, **k):
            raise ImportError(
                "ase is not installed in this environment; use "
                "g4s_tpu.models.deepmd.calculator.calc_ase_free instead")
