"""Atomic-spin model support (deepmd/utils/spin.py + the spin branches
of se_a.py/ener.py).

The reference represents each magnetic atom by an extra VIRTUAL particle
displaced from the real atom along its spin:

    x_virtual = x_real + virtual_len[t] * S / spin_norm[t]

and trains an ordinary energy/force model on the augmented system whose
type table appends one virtual type per spin-carrying real type (the
bundled NiO example's type.raw already materializes types [Ni, O,
Ni_spin]). Forces on virtual atoms are the magnetic forces
(dE/d x_virtual; LAMMPS fix precession uses them as dE/dS up to the
virtual_len/spin_norm scale).

So training needs only (a) the sel/ntypes expansion below and (b) the
standard trainer; this module adds the spin-specific coordinate and
force algebra for inference-time use with real (coord, spin) inputs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class SpinSpec(NamedTuple):
    use_spin: Tuple[bool, ...]      # per REAL type
    virtual_len: Tuple[float, ...]  # per spin-carrying type, in order
    spin_norm: Tuple[float, ...]

    @property
    def ntypes_spin(self) -> int:
        return sum(self.use_spin)


def expand_sel(sel, spin: SpinSpec):
    """Append the spin types' sel for the virtual types
    (se_a.py:197-199 sel_a_spin)."""
    sel = list(sel)
    return tuple(sel + [sel[i] for i, u in enumerate(spin.use_spin) if u])


def expand_ntypes(ntypes: int, spin: SpinSpec) -> int:
    return ntypes + spin.ntypes_spin


def augment(coord, spin_vec, types, spin: SpinSpec):
    """(coord (N,3), spin (N,3) zero on non-magnetic atoms, types (N,))
    -> (coord_aug (N+M,3), types_aug (N+M,)) with one virtual particle
    per magnetic atom, ordered real-then-virtual (the data layout of the
    bundled example)."""
    types_np = np.asarray(types)
    spin_ids = [i for i, u in enumerate(spin.use_spin) if u]
    vl = {t: spin.virtual_len[k] for k, t in enumerate(spin_ids)}
    sn = {t: spin.spin_norm[k] for k, t in enumerate(spin_ids)}
    vcoords, vtypes = [], []
    ntypes_real = len(spin.use_spin)
    for k, t in enumerate(spin_ids):
        m = types_np == t
        disp = spin_vec[m] * (vl[t] / sn[t])
        vcoords.append(coord[m] + disp)
        vtypes.append(np.full(int(m.sum()), ntypes_real + k, np.int32))
    coord_aug = jnp.concatenate([coord] + vcoords, axis=0)
    types_aug = np.concatenate([types_np] + vtypes)
    return coord_aug, jnp.asarray(types_aug)


def split_forces(forces, types_aug, spin: SpinSpec):
    """Split augmented-system forces into (atomic forces on real atoms,
    magnetic forces dE/dS per magnetic atom). dE/dS = f_virtual *
    virtual_len/spin_norm by the chain rule through `augment`."""
    types_np = np.asarray(types_aug)
    ntypes_real = len(spin.use_spin)
    real = types_np < ntypes_real
    f_real = forces[real]
    spin_ids = [i for i, u in enumerate(spin.use_spin) if u]
    f_mag = []
    for k, _t in enumerate(spin_ids):
        m = types_np == ntypes_real + k
        f_mag.append(forces[m] * (spin.virtual_len[k] / spin.spin_norm[k]))
    return f_real, (jnp.concatenate(f_mag, axis=0) if f_mag
                    else jnp.zeros((0, 3), forces.dtype))
