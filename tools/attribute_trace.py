"""Join a jax.profiler trace with the matching optimized-HLO text dump to
attribute per-call device time to repo source lines or named_scope paths.

Usage:
  python tools/attribute_trace.py <trace_dir> <hlo.txt> [n_calls]            # by source line
  python tools/attribute_trace.py --scopes <trace_dir> <hlo.txt> [n_calls]   # by named_scope

The trace must cover n_calls executions of exactly one jitted module whose
compiled text was dumped with `fn.lower(...).compile().as_text()`. NOTE: the
persistent compile cache hashes WITHOUT metadata — skip or clear it when
dumping HLO for attribution, or the executable text lacks source lines and
scopes (see CLAUDE.md).
"""
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

_PAT_INSTR = re.compile(r'%([\w.\-]+) =')
_PAT_COMP = re.compile(r'^%?([\w.\-]+) \(.*\) -> .* \{')
_PAT_CALLS = re.compile(r'calls=%([\w.\-]+)')
_PAT_META = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
_PAT_OP = re.compile(r'op_name="jit\(\w+\)/([^"]*)"')


def _source_tag(line: str):
    """'file.py:123' from the instruction's source metadata."""
    m = _PAT_META.search(line)
    return f"{m.group(1).split('/')[-1]}:{m.group(2)}" if m else None


def _scope_tag(line: str):
    """jax.named_scope path (without the trailing primitive) from op_name."""
    m = _PAT_OP.search(line)
    if not m:
        return None
    parts = m.group(1).split("/")
    return "/".join(parts[:-1]) if len(parts) > 1 else "(top)"


def _parse_hlo(hlo_path: str, tag_of_line):
    """-> (instr -> tag, computation -> [tags], fusion instr -> computation).

    One pass over the HLO text; `tag_of_line` decides what a tag is (source
    line or scope path), everything else — computation tracking, the
    fusion 'calls=' map — is shared by both attribution modes.
    """
    tag_of, comp_tags, fusion_comp = {}, defaultdict(list), {}
    cur_comp = None
    with open(hlo_path) as f:
        for line in f:
            m = _PAT_COMP.match(line.strip())
            if m and not line.startswith("  "):
                cur_comp = m.group(1)
                continue
            mi = _PAT_INSTR.search(line)
            if not mi:
                continue
            name = mi.group(1)
            tag = tag_of_line(line)
            if cur_comp and tag:
                comp_tags[cur_comp].append(tag)
            mc = _PAT_CALLS.search(line)
            if mc:
                fusion_comp[name] = mc.group(1)
            if tag:
                tag_of[name] = tag
    return tag_of, comp_tags, fusion_comp


def _device_us_by_tag(trace_dir: str, hlo_path: str, tag_of_line, n_calls: int):
    """-> (tag -> per-call device us, unattributed per-call us).

    A fused op's duration is split evenly over the tags of the computation
    it calls; un-fused ops map through their own tag.
    """
    tag_of, comp_tags, fusion_comp = _parse_hlo(hlo_path, tag_of_line)
    tfile = sorted(Path(trace_dir).rglob("*.trace.json.gz"))[-1]
    with gzip.open(tfile) as f:
        d = json.load(f)
    tids = {}
    for e in d["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    agg, unattr = defaultdict(float), 0.0
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        dur = e.get("dur", 0) / n_calls
        name = e["name"]
        tags = (comp_tags.get(fusion_comp[name]) if name in fusion_comp else None) \
            or ([tag_of[name]] if name in tag_of else None)
        if not tags:
            unattr += dur
            continue
        share = dur / len(tags)
        for t in tags:
            agg[t] += share
    return agg, unattr


def attribute(trace_dir: str, hlo_path: str, n_calls: int = 3, top: int = 25):
    """Per-call device time by repo source file and line."""
    by_line, unattr = _device_us_by_tag(trace_dir, hlo_path, _source_tag, n_calls)
    by_file = defaultdict(float)
    for t, v in by_line.items():
        by_file[t.split(":")[0]] += v
    print("per-call ms by source file:")
    for k, v in sorted(by_file.items(), key=lambda kv: -kv[1]):
        if v > 300:
            print(f"  {v/1000:7.2f}  {k}")
    print(f"  {unattr/1000:7.2f}  (unattributed)")
    print("\ntop source lines:")
    for k, v in sorted(by_line.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v/1000:7.2f}  {k}")


def attribute_scopes(trace_dir: str, hlo_path: str, n_calls: int = 3, top: int = 30):
    """Per-call device time by jax.named_scope path (first two levels)."""
    by_scope, unattr = _device_us_by_tag(trace_dir, hlo_path, _scope_tag, n_calls)
    agg = defaultdict(float)
    for t, v in by_scope.items():
        agg["/".join(t.split("/")[:2])] += v
    print("per-call ms by scope:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v/1000:7.2f}  {k}")
    print(f"  {unattr/1000:7.2f}  (unattributed)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--scopes"]
    fn = attribute_scopes if "--scopes" in sys.argv[1:] else attribute
    fn(args[0], args[1], int(args[2]) if len(args) > 2 else 3)
