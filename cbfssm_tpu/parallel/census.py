"""Collective census of compiled SPMD programs.

docs/SCALING.md's contract for the data mesh is: parameters replicated,
batch rows sharded, and the ONLY cross-device communication the gradient
``psum`` (plus scalar loss reductions) — never a batch-sized
all-gather/all-to-all. CPU-mesh loss-equality tests cannot check that
contract: a program that all-gathers every batch shard and computes the
whole model redundantly on every device produces identical losses while
scaling terribly over real ICI. (Exactly that was found by this audit in
round 5: CBFSSM's run-major ``reshape(2*B*S, d)`` flatten forced XLA to
all-gather the recognition pass's batch shards and replicate every GP
matmul — fixed by the batch-major flatten in ``ops.gp.predict_rows``.)

This module parses the post-partitioning optimized HLO of a compiled
program (``jax.stages.Compiled.as_text()``) and returns every collective
instruction with its payload size, so tests can pin the census and
``dryrun_multichip`` can attest it per round.

Terminology note: XLA spells jax's ``psum`` as ``all-reduce``; async
pairs (``all-reduce-start``/``-done``) are counted once via the start.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

COLLECTIVE_KINDS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
    "collective-broadcast",
    "ragged-all-to-all",
)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_OP_RE = re.compile(
    r"=\s*(?P<shape>\([^)]*\)|[a-z0-9]+\[[0-9,]*\]\S*)\s+"
    r"(?P<kind>" + "|".join(COLLECTIVE_KINDS) + r")(?P<variant>-start)?\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


@dataclass(frozen=True)
class Collective:
    kind: str  # one of COLLECTIVE_KINDS
    shapes: tuple[str, ...]  # result shape(s); >1 leaf for fused variadic ops
    result_bytes: int  # total result payload per execution (one device)
    op_name: str  # jax op_name metadata (trace provenance)

    @property
    def result_elements(self) -> int:
        total = 0
        for s in self.shapes:
            m = _SHAPE_RE.match(s)
            dims = [int(d) for d in m.group(2).split(",") if d] if m else []
            n = 1
            for d in dims:
                n *= d
            total += n
        return total


def _shape_bytes(shape_str: str) -> int:
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dtype, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def _as_text(program) -> str:
    """Accept a Compiled object, a Lowered (compiles it), or optimized
    HLO text. Order matters: ``jax.stages.Lowered`` ALSO has
    ``as_text()``, but it returns pre-partitioning StableHLO MLIR whose
    ops (``stablehlo.all_reduce``) this module's HLO regexes would
    silently miss — an empty census on a gather-filled program is the
    exact false-green this module exists to prevent, so Lowered is
    compiled first and MLIR-looking text is rejected loudly."""
    if isinstance(program, str):
        text = program
    elif hasattr(program, "compile"):  # Lowered (Compiled has no .compile)
        text = program.compile().as_text()
    elif hasattr(program, "as_text"):
        text = program.as_text()
    else:
        raise TypeError(f"cannot extract HLO text from {type(program)!r}")
    if "stablehlo." in text and "HloModule" not in text:
        raise ValueError(
            "got StableHLO MLIR, not post-partitioning optimized HLO — "
            "census needs Compiled.as_text() (pass the Compiled, or the "
            "Lowered itself so it can be compiled)"
        )
    return text


def collectives(program) -> list[Collective]:
    """Every collective instruction in a compiled program's optimized
    HLO (post SPMD partitioning), in textual order. ``-done`` halves of
    async pairs are skipped (the ``-start`` carries the payload)."""
    out = []
    for line in _as_text(program).splitlines():
        m = _OP_RE.search(line)
        if m is None:
            continue
        shape_field = m.group("shape")
        if shape_field.startswith("("):
            # variadic result "(f32[5]{0}, f32[20,5]{1,0}, ...)" — naive
            # ','-splitting would also split inside dims, so findall
            shapes = tuple(
                f"{t}[{d}]" for t, d in _SHAPE_RE.findall(shape_field)
            )
        else:
            sm = _SHAPE_RE.match(shape_field)
            shapes = (f"{sm.group(1)}[{sm.group(2)}]",) if sm else (shape_field,)
        name = _OPNAME_RE.search(line)
        out.append(
            Collective(
                kind=m.group("kind"),
                shapes=shapes,
                result_bytes=sum(_shape_bytes(s) for s in shapes),
                op_name=name.group(1) if name else "",
            )
        )
    return out


def census(program) -> dict[str, int]:
    """{collective kind: instruction count} for a compiled program."""
    counts: dict[str, int] = {}
    for c in collectives(program):
        counts[c.kind] = counts.get(c.kind, 0) + 1
    return counts


def describe(program) -> str:
    """One line per collective: kind, payload, provenance (for logs and
    the dryrun attestation)."""
    items = collectives(program)
    if not items:
        return "collective census: none (embarrassingly parallel)"
    lines = [f"collective census: {len(items)} instruction(s)"]
    for c in items:
        lines.append(
            f"  {c.kind:<20} {c.result_bytes:>8} B  "
            f"{'+'.join(c.shapes)}  [{c.op_name.split('/')[-1]}]"
        )
    return "\n".join(lines)


def assert_data_parallel_contract(program, max_reduce_bytes: int,
                                  context: str = "") -> list[Collective]:
    """Assert the data-mesh communication contract on a compiled
    program: the only collectives are all-reduces (gradient psums /
    scalar loss reductions) of bounded payload — no batch-sized
    gather/scatter traffic. Returns the parsed collectives so callers
    can pin counts too.

    ``max_reduce_bytes`` should be sized to the parameter pytree (the
    largest legitimate psum payload); a batch-carrying operand slipping
    into a psum would blow through it.
    """
    items = collectives(program)
    where = f" in {context}" if context else ""
    bad_kinds = [c for c in items if c.kind != "all-reduce"]
    assert not bad_kinds, (
        f"non-psum collective(s){where}: "
        + "; ".join(f"{c.kind} {c.shapes} ({c.op_name})" for c in bad_kinds)
    )
    too_big = [c for c in items if c.result_bytes > max_reduce_bytes]
    assert not too_big, (
        f"all-reduce payload(s) exceed {max_reduce_bytes} B{where} "
        "(batch-sized operand in a psum?): "
        + "; ".join(f"{c.shapes} = {c.result_bytes} B" for c in too_big)
    )
    return items
