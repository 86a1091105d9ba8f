"""Static roofline analyzer for jitted TPU programs.

Walks a function's jaxpr and extracts every MXU op (``dot_general`` /
``conv_general_dilated``), computing for each:

- exact model MACs/FLOPs,
- *attainable* FLOPs under TPU tile quantization — the MXU consumes
  (8, 128) f32 / lane-128 tiles, so a matmul's contraction and output
  feature dims are padded to 128 lanes and its row dim to 8 sublanes;
  a conv with 32 output channels therefore pays for 128,
- HBM bytes moved (operands + result at their aval dtypes, assuming
  every elementwise producer/consumer fuses — the XLA-optimistic
  bound), and
- the per-op roofline time ``max(padded_flops / peak, bytes / bw)``.

Summing per-op rooflines gives the *attainable ceiling* for the whole
program on the target chip: no schedule can beat it without changing
the formulation (fewer MACs or better-packed lanes).  Comparing the
measured wall time against this ceiling converts "low MFU because the
architecture is small-channel" from narrative into a number — the gap
that remains *is* addressable; the quantization+bandwidth part is not,
short of reformulation.  (Round-5 verdict item 5; the naive-MFU
denominator in ``bench.py`` divides by raw peak instead.)

Non-MXU eqns are accumulated as an *unfused elementwise byte* total
(each output written once and read once downstream).  True traffic lies
between 0 (perfect fusion) and that bound, so the report brackets the
ceiling with both.

Control flow: ``scan`` bodies are multiplied by their trip count,
``pjit``/``remat``/custom-grad calls are recursed, ``cond``/``switch``
branches contribute their *maximum* (upper bound), ``while`` trip
counts are unknowable statically and are counted once with a flag in
the report.

Reference scope: the analyzer targets the serving forward re-designed
from ``/root/reference/model/diff3.py:105-212`` (the small-channel UNet
this project's MFU story hinges on), but works on any jittable fn.
"""

from __future__ import annotations

import dataclasses
import math
from collections import defaultdict
from typing import Any, Dict, Optional

import jax
import numpy as np

# bf16 MXU peaks and HBM bandwidth per chip generation (public specs;
# "How to Scale Your Model" table).  f32 runs at half the matmul peak.
CHIP_SPECS = {
    "v4": {"peak_bf16": 275e12, "hbm_gbps": 1228e9},
    "v5 lite": {"peak_bf16": 197e12, "hbm_gbps": 819e9},
    "v5e": {"peak_bf16": 197e12, "hbm_gbps": 819e9},
    "v5p": {"peak_bf16": 459e12, "hbm_gbps": 2765e9},
    "v6 lite": {"peak_bf16": 918e12, "hbm_gbps": 1640e9},
    "v6e": {"peak_bf16": 918e12, "hbm_gbps": 1640e9},
}

_LANE = 128   # minor-dim tile (always 128 lanes)
_SUBLANE = 8  # second-minor tile rows (f32; bf16 packs 16 but the MXU
              # feed granularity stays 8 — use 8, the optimistic bound)


def _ceil_to(x: int, m: int) -> int:
    return int(math.ceil(x / m) * m) if x else 0


@dataclasses.dataclass
class OpCost:
    """One MXU op (or one group of identically-shaped ops)."""

    kind: str           # dot_general | conv
    shape_sig: str      # human-readable B/M/K/N signature
    count: int = 0      # executions (scan trips folded in)
    macs: float = 0.0   # exact model MACs per execution
    padded_macs: float = 0.0
    bytes_moved: float = 0.0  # operand+result bytes per execution

    @property
    def flops(self):
        return 2.0 * self.macs * self.count

    @property
    def padded_flops(self):
        return 2.0 * self.padded_macs * self.count

    @property
    def total_bytes(self):
        return self.bytes_moved * self.count

    def roofline_s(self, peak: float, bw: float) -> float:
        return max(self.padded_flops / peak, self.total_bytes / bw)


@dataclasses.dataclass
class RooflineReport:
    ops: Dict[str, OpCost]
    elementwise_bytes: float  # non-MXU output bytes (write + one read)
    has_unbounded_while: bool

    def totals(self, peak: float, bw: float) -> Dict[str, Any]:
        flops = sum(o.flops for o in self.ops.values())
        pflops = sum(o.padded_flops for o in self.ops.values())
        mxu_bytes = sum(o.total_bytes for o in self.ops.values())
        attainable = sum(o.roofline_s(peak, bw) for o in self.ops.values())
        return {
            "model_flops": flops,
            "padded_flops": pflops,
            "lane_occupancy": flops / pflops if pflops else 1.0,
            "mxu_bytes": mxu_bytes,
            "elementwise_bytes": self.elementwise_bytes,
            "compute_bound_s": flops / peak,
            "padded_compute_bound_s": pflops / peak,
            "mxu_memory_bound_s": mxu_bytes / bw,
            "attainable_s_fused": attainable,
            "attainable_s_unfused": attainable + self.elementwise_bytes / bw,
            "has_unbounded_while": self.has_unbounded_while,
        }


def _aval_bytes(v) -> float:
    aval = v.aval
    return float(np.prod(aval.shape)) * aval.dtype.itemsize


def _dot_cost(eqn) -> OpCost:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval for v in eqn.invars)
    B = float(np.prod([lhs.shape[i] for i in lb])) if lb else 1.0
    K = float(np.prod([lhs.shape[i] for i in lc])) if lc else 1.0
    m_dims = [d for i, d in enumerate(lhs.shape) if i not in lc and i not in lb]
    n_dims = [d for i, d in enumerate(rhs.shape) if i not in rc and i not in rb]
    M = float(np.prod(m_dims)) if m_dims else 1.0
    N = float(np.prod(n_dims)) if n_dims else 1.0
    out_bytes = _aval_bytes(eqn.outvars[0])
    return OpCost(
        kind="dot_general",
        shape_sig=f"B{B:g} M{M:g} K{K:g} N{N:g}",
        macs=B * M * K * N,
        padded_macs=B * _ceil_to(M, _SUBLANE) * _ceil_to(K, _LANE)
        * _ceil_to(N, _LANE),
        bytes_moved=_aval_bytes(eqn.invars[0]) + _aval_bytes(eqn.invars[1])
        + out_bytes,
    )


def _conv_cost(eqn) -> OpCost:
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    lhs, rhs = (v.aval for v in eqn.invars)
    out = eqn.outvars[0].aval
    cin = lhs.shape[dn.lhs_spec[1]]
    cout = out.shape[dn.out_spec[1]]
    ksp = [rhs.shape[i] for i in dn.rhs_spec[2:]]
    out_sp = [out.shape[i] for i in dn.out_spec[2:]]
    batch = out.shape[dn.out_spec[0]]
    K = float(np.prod(ksp)) * (cin / groups)
    M = float(batch * np.prod(out_sp))
    # im2col view: M x K x Cout per group; lanes pad K and Cout
    padded = groups * _ceil_to(M, _SUBLANE) * _ceil_to(
        int(np.prod(ksp)) * (cin // groups), _LANE
    ) * _ceil_to(cout // groups, _LANE)
    return OpCost(
        kind="conv",
        shape_sig=(f"M{M:g} k{'x'.join(map(str, ksp))} "
                   f"Cin{cin} Cout{cout}" + (f" g{groups}" if groups > 1 else "")),
        macs=M * K * (cout / groups),
        padded_macs=float(padded),
        bytes_moved=_aval_bytes(eqn.invars[0]) + _aval_bytes(eqn.invars[1])
        + _aval_bytes(eqn.outvars[0]),
    )


_CALL_JAXPR_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr")


def _walk(jaxpr, mult: float, acc: Dict[str, OpCost], state: dict):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            cost = _dot_cost(eqn)
        elif prim == "conv_general_dilated":
            cost = _conv_cost(eqn)
        else:
            cost = None
        if cost is not None:
            key = f"{cost.kind} {cost.shape_sig}"
            if key not in acc:
                acc[key] = cost
            acc[key].count += mult
            continue

        if prim == "scan":
            _walk(eqn.params["jaxpr"].jaxpr,
                  mult * eqn.params["length"], acc, state)
        elif prim == "while":
            state["while"] = True
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, acc, state)
        elif prim == "cond":
            # upper bound: cost of the most expensive branch
            best: Dict[str, OpCost] = {}
            best_flops = -1.0
            for br in eqn.params["branches"]:
                sub: Dict[str, OpCost] = {}
                _walk(br.jaxpr, mult, sub, state)
                f = sum(o.flops for o in sub.values())
                if f > best_flops:
                    best, best_flops = sub, f
            for k, v in best.items():
                if k in acc:
                    acc[k].count += v.count
                else:
                    acc[k] = v
        else:
            sub = next((eqn.params[p] for p in _CALL_JAXPR_PARAMS
                        if p in eqn.params), None)
            if sub is not None:
                _walk(getattr(sub, "jaxpr", sub), mult, acc, state)
            else:
                # elementwise / reshape / concat / reduce ...: count the
                # output bytes as potential unfused traffic (1 write +
                # 1 read); pure metadata ops move nothing but are cheap
                # to overcount — the unfused number is an upper bracket
                state["ew_bytes"] += 2.0 * mult * sum(
                    _aval_bytes(v) for v in eqn.outvars
                    if hasattr(v.aval, "shape"))


def analyze(fn, *args, **kwargs) -> RooflineReport:
    """Trace ``fn(*args, **kwargs)`` and return its roofline report."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    acc: Dict[str, OpCost] = {}
    state = {"ew_bytes": 0.0, "while": False}
    _walk(jaxpr.jaxpr, 1.0, acc, state)
    return RooflineReport(ops=acc, elementwise_bytes=state["ew_bytes"],
                          has_unbounded_while=state["while"])


def chip_spec(device=None) -> Optional[Dict[str, float]]:
    """Look up the peak/bandwidth entry for a jax device (None on an
    unknown chip — callers must not silently assume a denominator)."""
    kind = getattr(device, "device_kind", "").lower() if device else ""
    for key, spec in CHIP_SPECS.items():
        if key in kind:
            return spec
    return None


def format_report(report: RooflineReport, peak: float, bw: float,
                  measured_s: Optional[float] = None, top: int = 12) -> str:
    """Markdown table: top ops by roofline share + program totals."""
    t = report.totals(peak, bw)
    lines = [
        "| op | shape | count | GFLOP | occupancy | MB | bound | roofline µs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    ops = sorted(report.ops.values(),
                 key=lambda o: -o.roofline_s(peak, bw))
    for o in ops[:top]:
        bound = ("compute" if o.padded_flops / peak
                 >= o.total_bytes / bw else "memory")
        lines.append(
            f"| {o.kind} | {o.shape_sig} | {o.count:g} "
            f"| {o.flops / 1e9:.2f} | {o.flops / o.padded_flops:.2f} "
            f"| {o.total_bytes / 1e6:.1f} | {bound} "
            f"| {o.roofline_s(peak, bw) * 1e6:.0f} |")
    rest = ops[top:]
    if rest:
        rs = sum(o.roofline_s(peak, bw) for o in rest)
        lines.append(f"| … {len(rest)} more | | | | | | | {rs * 1e6:.0f} |")
    lines.append("")
    lines.append(
        f"- model FLOPs {t['model_flops'] / 1e9:.1f} G, padded "
        f"{t['padded_flops'] / 1e9:.1f} G (lane occupancy "
        f"{t['lane_occupancy']:.3f})")
    lines.append(
        f"- attainable ceiling: {t['attainable_s_fused'] * 1e3:.2f} ms fused "
        f"— {t['attainable_s_unfused'] * 1e3:.2f} ms unfused "
        f"(MXU memory bound {t['mxu_memory_bound_s'] * 1e3:.2f} ms, padded "
        f"compute bound {t['padded_compute_bound_s'] * 1e3:.2f} ms)")
    if measured_s is not None:
        gap_f = measured_s / t["attainable_s_fused"]
        gap_u = measured_s / t["attainable_s_unfused"]
        lines.append(
            f"- measured {measured_s * 1e3:.2f} ms = {gap_f:.2f}x the fused "
            f"ceiling, {gap_u:.2f}x the unfused bracket")
    if report.has_unbounded_while:
        lines.append("- WARNING: contains while-loops counted once "
                     "(trip counts unknown statically)")
    return "\n".join(lines)
