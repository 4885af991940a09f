"""Compiled-HLO collective audit.

BASELINE.md's boundary-exchange decision (codebook replication: ~1 MB/step of
cross-replica traffic vs ~963 MB/step for exact B' feature exchange) was an
*analysis*.  This module turns it into a property the compiler is held to:
parse the compiled HLO of the sharded/DDP train step, extract every
collective op and its payload bytes, and let tests assert (a) the per-step
byte ledger matches the analytic budget and (b) no collective ever moves the
feature table, the edge arrays, or anything else graph-sized.

The reference has no distributed machinery to audit (SURVEY §2.3); this is
TPU-native infrastructure for the mesh design in ``parallel/mesh.py`` /
``parallel/multihost.py``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List

_COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
    "collective-broadcast",
)

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")
# "%name = <result shapes> <op>(" — op can be suffixed (all-reduce-start)
_LINE_RE = re.compile(
    r"=\s*(.+?)\s+(" + "|".join(_COLLECTIVE_OPS) + r")(?:-start|-done)?\("
)


@dataclass
class Collective:
    op: str  # e.g. "all-reduce"
    shapes: List[tuple]  # [(dtype, dims), ...] result payload(s)
    bytes: int  # total payload bytes (sum over tuple elements)
    line: str  # the HLO line (trimmed), for diagnostics

    @property
    def elements(self) -> List[int]:
        out = []
        for _, dims in self.shapes:
            n = 1
            for d in dims:
                n *= d
            out.append(n)
        return out


def parse_collectives(hlo_text: str) -> List[Collective]:
    """All collective ops in a compiled HLO module, with payload shapes.

    ``*-done`` ops are skipped (the payload is counted once at ``-start`` /
    the sync form).  Token-typed and zero-sized operands are ignored.
    """
    out = []
    for raw in hlo_text.splitlines():
        line = raw.strip()
        m = _LINE_RE.search(line)
        if m is None or "-done(" in line:
            continue
        result_part, op = m.group(1), m.group(2)
        shapes = []
        nbytes = 0
        for dt, dims_s in _SHAPE_RE.findall(result_part):
            if dt not in _DTYPE_BYTES:
                continue
            dims = tuple(int(d) for d in dims_s.split(",") if d)
            n = 1
            for d in dims:
                n *= d
            shapes.append((dt, dims))
            nbytes += n * _DTYPE_BYTES[dt]
        if shapes:
            out.append(
                Collective(op=op, shapes=shapes, bytes=nbytes, line=line[:200])
            )
    return out


def collective_ledger(collectives: List[Collective]) -> Dict[str, int]:
    """Total payload bytes per collective op kind."""
    ledger: Dict[str, int] = {}
    for c in collectives:
        ledger[c.op] = ledger.get(c.op, 0) + c.bytes
    return ledger


def compiled_text(jitted_fn, *args, **kwargs) -> str:
    """Lower + compile a jitted function and return the optimized HLO text
    (post-SPMD-partitioning, i.e. with the inserted collectives)."""
    return jitted_fn.lower(*args, **kwargs).compile().as_text()
