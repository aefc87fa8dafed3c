"""circom `.r1cs` binary parser.

Re-design of the reference's parser
(constantine/proof_systems/constraint_systems/r1cs_circom_parser.nim):
sections (header / constraints / wire-to-label map) of the iden3 r1cs
binary format (https://github.com/iden3/r1csfile/blob/master/doc/
r1cs_bin_format.md). Host-side IO; constraint matrices come out as sparse
(row, wire_index, coefficient) triples ready to scatter into device arrays
for witness-checking (A.w * B.w = C.w lane-parallel over constraints).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

MAGIC = b"r1cs"

SECTION_HEADER = 1
SECTION_CONSTRAINTS = 2
SECTION_WIRE2LABEL = 3


@dataclass
class R1csHeader:
    field_size: int          # bytes per field element
    prime: int               # field modulus (little-endian in file)
    n_wires: int
    n_pub_out: int
    n_pub_in: int
    n_prv_in: int
    n_labels: int
    n_constraints: int


@dataclass
class R1cs:
    version: int
    header: R1csHeader
    # constraints[i] = (A, B, C), each a list of (wire_index, coeff_int)
    constraints: List[Tuple[list, list, list]] = field(default_factory=list)
    wire_to_label: List[int] = field(default_factory=list)

    def to_sparse(self):
        """-> dict with 'A'/'B'/'C' as (rows, cols, coeffs) int lists —
        the scatter-ready COO form for device witness checking."""
        out = {}
        for name, k in (("A", 0), ("B", 1), ("C", 2)):
            rows, cols, vals = [], [], []
            for i, con in enumerate(self.constraints):
                for widx, coeff in con[k]:
                    rows.append(i)
                    cols.append(widx)
                    vals.append(coeff)
            out[name] = (rows, cols, vals)
        return out


def _read_lincomb(buf, off, fs):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    terms = []
    for _ in range(n):
        (widx,) = struct.unpack_from("<I", buf, off)
        off += 4
        coeff = int.from_bytes(buf[off:off + fs], "little")
        off += fs
        terms.append((widx, coeff))
    return terms, off


def parse_r1cs(data: bytes) -> R1cs:
    """Parse an in-memory .r1cs file (r1cs_circom_parser.nim parseR1csFile
    analogue). Raises ValueError on malformed input."""
    if data[:4] != MAGIC:
        raise ValueError("not an r1cs file (bad magic)")
    version, n_sections = struct.unpack_from("<II", data, 4)
    off = 12
    sections: Dict[int, Tuple[int, int]] = {}
    for _ in range(n_sections):
        stype, ssize = struct.unpack_from("<IQ", data, off)
        off += 12
        sections[stype] = (off, ssize)
        off += ssize

    if SECTION_HEADER not in sections:
        raise ValueError("missing header section")
    hoff, _ = sections[SECTION_HEADER]
    (fs,) = struct.unpack_from("<I", data, hoff)
    prime = int.from_bytes(data[hoff + 4:hoff + 4 + fs], "little")
    nw, npo, npi, nprv = struct.unpack_from("<IIII", data, hoff + 4 + fs)
    (nl,) = struct.unpack_from("<Q", data, hoff + 20 + fs)
    (nc,) = struct.unpack_from("<I", data, hoff + 28 + fs)
    header = R1csHeader(fs, prime, nw, npo, npi, nprv, nl, nc)
    out = R1cs(version=version, header=header)

    if SECTION_CONSTRAINTS in sections:
        coff, _ = sections[SECTION_CONSTRAINTS]
        pos = coff
        for _ in range(nc):
            A, pos = _read_lincomb(data, pos, fs)
            B, pos = _read_lincomb(data, pos, fs)
            C, pos = _read_lincomb(data, pos, fs)
            out.constraints.append((A, B, C))

    if SECTION_WIRE2LABEL in sections:
        woff, wsize = sections[SECTION_WIRE2LABEL]
        cnt = wsize // 8
        out.wire_to_label = list(
            struct.unpack_from(f"<{cnt}Q", data, woff))
    return out


def parse_r1cs_file(path: str) -> R1cs:
    with open(path, "rb") as f:
        return parse_r1cs(f.read())
