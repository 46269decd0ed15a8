"""CHEMKIN-II mechanism input (reference ``src/chemistry.f90``
read_species/read_thermo/read_reactions — the units of chem.inp are
cm³, mole, sec, cal and K; reference header comment chemistry.f90:4-8).

Parses ``chem.inp`` into plain numpy arrays ready for the jittable
reaction-rate kernel in ``physics/chemistry_chemkin.py``:

* species names + molar masses from the element composition fields
  (element table = reference eos_chemistry.f90:1398 find_mass),
* NASA-7 thermodynamic polynomials (two ranges, per-species T_mid),
* the stoichiometric matrices Sijp (reactants) / Sijm (products),
  Arrhenius (lnA, b, E_cal), reversibility, third-body efficiencies
  a_k4 (default 1 for unlisted species once any efficiency line is
  present — chemistry.f90:4046), Lindemann LOW and Troe falloff
  coefficients, and the (+M) vs +M distinction (Mplus_case).

Also reads ``air.dat``-style initial condition files (reference
chemistry.f90 air_field: the percentages are used directly as mass
fractions /100, renormalised; T in K, P in dyn/cm²).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

# reference eos_chemistry.f90:1398-1431
ELEMENT_MASS = {
    "H": 1.00794, "C": 12.0107, "N": 14.00674, "O": 15.9994,
    "AR": 39.948, "HE": 4.0026, "S": 32.0655, "CLOUD": 0.0,
}


@dataclass
class Mechanism:
    species: List[str]
    mass: np.ndarray            # (ns,) g/mol
    # NASA-7: a[ns, 2, 7] with [:,0]=low range, [:,1]=high range
    nasa: np.ndarray
    T_ranges: np.ndarray        # (ns, 3): Tlo, Tmid, Thi
    # reactions
    Sijp: np.ndarray            # (ns, nr) reactant stoichiometry
    Sijm: np.ndarray            # (ns, nr) product stoichiometry
    lnA: np.ndarray             # (nr,)  ln of pre-exponential (cgs-mol)
    b: np.ndarray               # (nr,)  temperature exponent
    E_cal: np.ndarray           # (nr,)  activation energy [cal/mol]
    back: np.ndarray            # (nr,) bool, reversible
    mplus: np.ndarray           # (nr,) bool, '(+M)' falloff notation
    a_k4: np.ndarray            # (ns, nr) third-body efficiencies, NaN=none
    low: np.ndarray             # (nr, 3) lnA0, b0, E0_cal  (0 = absent)
    has_low: np.ndarray         # (nr,) bool
    troe: np.ndarray            # (nr, 3) a, T3, T1          (0 = absent)
    has_troe: np.ndarray        # (nr,) bool
    reaction_text: List[str] = field(default_factory=list)

    @property
    def ns(self):
        return len(self.species)

    @property
    def nr(self):
        return self.lnA.shape[0]


def _species_mass(comp_field: str) -> float:
    """Elemental composition from THERMO line-1 columns 25-44 (+74-78):
    groups of (2-char element, 3-char count)."""
    m = 0.0
    for i in range(0, len(comp_field) - 4, 5):
        sym = comp_field[i:i + 2].strip().upper()
        cnt = comp_field[i + 2:i + 5].strip()
        if not sym or sym == "0":
            continue
        try:
            n = int(float(cnt)) if cnt else 0
        except ValueError:
            continue
        if n and sym in ELEMENT_MASS:
            m += n * ELEMENT_MASS[sym]
    return m


def _e15(line: str, n: int) -> List[float]:
    out = []
    for i in range(n):
        s = line[15 * i:15 * (i + 1)].strip()
        out.append(float(s) if s else 0.0)
    return out


_COEF_RE = re.compile(r"^(\d+\.?\d*)\s*(.*)$")


def _parse_side(side: str) -> List[Tuple[str, float]]:
    """'H+O2' → [(H,1),(O2,1)]; handles leading numeric coefficients and
    repeated species ('H+H')."""
    out = []
    for tok in side.split("+"):
        tok = tok.strip()
        if not tok or tok == "M":
            continue
        mm = _COEF_RE.match(tok)
        if mm and mm.group(2):
            out.append((mm.group(2).strip(), float(mm.group(1))))
        else:
            out.append((tok, 1.0))
    return out


def parse_chem_inp(path: str) -> Mechanism:
    lines = open(path).read().splitlines()
    # strip comments ('!' to end of line), keep original for THERMO columns
    sect = None
    species: List[str] = []
    thermo: Dict[str, tuple] = {}
    reactions = []
    i = 0
    while i < len(lines):
        raw = lines[i]
        line = raw.split("!")[0].rstrip()
        up = line.strip().upper()
        i += 1
        if not up:
            continue
        if up.startswith("ELEMENT"):
            sect = "elem"
            continue
        if up.startswith("SPECIES"):
            sect = "spec"
            continue
        if up.startswith("THERMO"):
            sect = "thermo"
            # optional global T-range line follows; detect by 3 floats
            continue
        if up.startswith("REACTIONS"):
            sect = "reac"
            continue
        if up == "END":
            sect = None
            continue
        if sect == "spec":
            species.extend(line.split())
        elif sect == "thermo":
            toks = line.split()
            if len(toks) == 3 and all(
                    re.match(r"^[\d.+-Ee]+$", t) for t in toks):
                continue       # the global default T-range line
            if len(line) >= 80 and line[79] == "1":
                name = line[:18].split()[0]
                comp = line[24:44] + " " + line[73:78]
                try:
                    tlo = float(line[45:55])
                    thi = float(line[55:65])
                    tmid_s = line[65:73].strip()
                    tmid = float(tmid_s) if tmid_s else 1000.0
                except ValueError:
                    continue
                a_hi = _e15(lines[i].split("!")[0], 5)
                l3 = _e15(lines[i + 1].split("!")[0], 5)
                l4 = _e15(lines[i + 2].split("!")[0], 4)
                i += 3
                ah = a_hi + l3[:2]                  # a1..a7 high
                al = l3[2:] + l4                    # a1..a7 low
                thermo[name] = (_species_mass(comp), al, ah,
                                (tlo, tmid, thi))
        elif sect == "reac":
            s = line.strip()
            supper = s.upper()
            if supper.startswith("DUPLICATE"):
                continue
            if "LOW" in supper and "/" in s:
                body = s[s.index("/") + 1:s.rindex("/")]
                v = [float(x) for x in body.split()]
                reactions[-1]["low"] = v
                continue
            if "TROE" in supper and "/" in s:
                body = s[s.index("/") + 1:s.rindex("/")]
                v = [float(x) for x in body.split()]
                reactions[-1]["troe"] = v[:3]       # reference keeps 3
                continue
            if "=" in s:
                toks = s.split()
                A, bexp, E = (float(toks[-3]), float(toks[-2]),
                              float(toks[-1]))
                eq = "".join(toks[:-3])
                rev = "=>" not in eq or "<=>" in eq
                eq_n = eq.replace("<=>", "=").replace("=>", "=")
                mplus = "(+M)" in eq_n
                eq_n = eq_n.replace("(+M)", "")
                third = mplus or re.search(r"(^|\+)M($|\+|=)", eq_n)
                lhs, rhs = eq_n.split("=")
                reactions.append({
                    "lhs": _parse_side(lhs), "rhs": _parse_side(rhs),
                    "A": A, "b": bexp, "E": E, "rev": rev,
                    "mplus": mplus, "third": bool(third),
                    "eff": None, "low": None, "troe": None, "text": s,
                })
                continue
            if "/" in s:
                # efficiency line: 'H2/2.5/ H2O/12.0/'
                eff = reactions[-1].setdefault("eff", {}) or {}
                for mm in re.finditer(r"([A-Za-z0-9()*+-]+)\s*/\s*"
                                      r"([\d.eE+-]+)\s*/", s):
                    eff[mm.group(1)] = float(mm.group(2))
                reactions[-1]["eff"] = eff
                continue

    ns, nr = len(species), len(reactions)
    sidx = {name: k for k, name in enumerate(species)}
    mass = np.array([thermo[sp][0] for sp in species])
    nasa = np.zeros((ns, 2, 7))
    T_ranges = np.zeros((ns, 3))
    for k, sp in enumerate(species):
        _, al, ah, tr = thermo[sp]
        nasa[k, 0], nasa[k, 1] = al, ah
        T_ranges[k] = tr

    Sijp = np.zeros((ns, nr))
    Sijm = np.zeros((ns, nr))
    lnA = np.zeros(nr)
    bb = np.zeros(nr)
    EE = np.zeros(nr)
    back = np.zeros(nr, bool)
    mplus = np.zeros(nr, bool)
    a_k4 = np.full((ns, nr), np.nan)
    low = np.zeros((nr, 3))
    has_low = np.zeros(nr, bool)
    troe = np.zeros((nr, 3))
    has_troe = np.zeros(nr, bool)
    texts = []
    for j, r in enumerate(reactions):
        for name, c in r["lhs"]:
            Sijp[sidx[name], j] += c
        for name, c in r["rhs"]:
            Sijm[sidx[name], j] += c
        lnA[j] = np.log(r["A"]) if r["A"] != 0 else 0.0
        bb[j], EE[j] = r["b"], r["E"]
        back[j], mplus[j] = r["rev"], r["mplus"]
        if r["eff"] is not None:
            a_k4[:, j] = 1.0        # unlisted default (chemistry.f90:4046)
            for name, v in r["eff"].items():
                if name in sidx:
                    a_k4[sidx[name], j] = v
        if r["low"] is not None:
            A0, b0, E0 = r["low"]
            low[j] = (np.log(A0) if A0 != 0 else 0.0, b0, E0)
            has_low[j] = True
        if r["troe"] is not None:
            troe[j] = r["troe"]
            has_troe[j] = True
        texts.append(r["text"])
    return Mechanism(species, mass, nasa, T_ranges, Sijp, Sijm,
                     lnA, bb, EE, back, mplus, a_k4, low, has_low,
                     troe, has_troe, texts)


def parse_air_dat(path: str):
    """Reference air_field (chemistry.f90): returns (T, P_cgs, {species:
    mass fraction}) — percentages are divided by 100 and renormalised."""
    TT, PP = 300.0, 1.013e6
    fracs: Dict[str, float] = {}
    for raw in open(path):
        line = raw.split("!")[0].strip()
        if not line:
            continue
        if line[0] == "T":
            TT = float(line.split("=")[-1].split()[0])
        elif line[0] == "P":
            PP = float(line.split("=")[-1].split()[0])
        elif line[0] == "V":
            continue
        else:
            toks = line.split()
            if len(toks) >= 2:
                try:
                    fracs[toks[0]] = float(toks[1]) * 0.01
                except ValueError:
                    pass
    tot = sum(fracs.values())
    fracs = {k: v / tot for k, v in fracs.items()}
    return TT, PP, fracs


def parse_kreactions(m_path: str, p_path: str):
    """Reference 'Axel case' reaction tables (chemistry.f90:2770-2825,
    .not. lcheminp): ``chemistry_m.dat`` rows = (k⁻_j, Sijm columns),
    ``chemistry_p.dat`` rows = (k⁺_j, Sijp columns).  Rate of progress
    v_j = k⁺_j·ΠY^Sijm − k⁻_j·ΠY^Sijp and dY_k/dt = Σ_j (Sijp−Sijm)·v_j
    (the double negation in calc_reaction_term cancels against
    stoichio = Sijp−Sijm).

    Returns (species, reactions) in the physics.chemistry.Chemistry
    format: rate = A·ΠY^st(reactants), net = products − reactants."""
    def read(path):
        rows, species = [], None
        for raw in open(path):
            line = raw.split("!")[0].strip()
            if not line:
                continue
            toks = line.split()
            if species is None:
                species = [t for t in toks[1:] if "=" not in t]
                continue
            k = float(toks[0])
            st = [float(t) for t in toks[1:1 + len(species)]]
            rows.append((k, st))
        return species, rows

    species, mrows = read(m_path)
    _, prows = read(p_path)
    assert len(mrows) == len(prows), "nreactions1 /= nreactions2"
    reactions = []
    for (km, Sm), (kp, Sp) in zip(mrows, prows):
        lhs = tuple((species[i], s) for i, s in enumerate(Sm) if s != 0)
        rhs = tuple((species[i], s) for i, s in enumerate(Sp) if s != 0)
        if kp != 0.0:
            reactions.append((lhs, rhs, kp, 0.0, 0.0))
        if km != 0.0:
            reactions.append((rhs, lhs, km, 0.0, 0.0))
    return species, tuple(reactions)


def parse_tran_dat(path: str, species: List[str]) -> np.ndarray:
    """CHEMKIN transport data (reference chemistry.f90 read_transport_data):
    per species (geometry, eps/kB [K], sigma [Å], dipole [Debye],
    polarizability [Å³], Z_rot).  Returns (ns, 6) in file column order —
    tran_data(k, 2)=eps, (k,3)=sigma, (k,4)=dipole as the reference
    indexes them (1-based with the geometry flag first)."""
    table = {}
    for raw in open(path):
        line = raw.split("!")[0].strip()
        if not line:
            continue
        toks = line.split()
        if len(toks) >= 7:
            try:
                table[toks[0].upper()] = [float(v) for v in toks[1:7]]
            except ValueError:
                continue
    out = np.zeros((len(species), 6))
    for k, sp in enumerate(species):
        if sp.upper() in table:
            out[k] = table[sp.upper()]
    return out
