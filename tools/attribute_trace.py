"""Join a jax.profiler trace with the matching optimized-HLO text dump to
attribute per-call device time to repo source lines.

Usage: python tools/attribute_trace.py <trace_dir> <hlo.txt> [n_calls]
The trace must cover n_calls executions of exactly one jitted module whose
compiled text was dumped with `fn.lower(...).compile().as_text()`.
"""
import gzip, json, re, sys
from collections import defaultdict
from pathlib import Path


def attribute(trace_dir: str, hlo_path: str, n_calls: int = 3, top: int = 25):
    src_of, comp_ops, fusion_comp = {}, defaultdict(list), {}
    cur_comp = None
    pat_meta = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
    pat_instr = re.compile(r'%([\w.\-]+) =')
    pat_comp = re.compile(r'^%?([\w.\-]+) \(.*\) -> .* \{')
    pat_calls = re.compile(r'calls=%([\w.\-]+)')
    with open(hlo_path) as f:
        for line in f:
            m = pat_comp.match(line.strip())
            if m and not line.startswith("  "):
                cur_comp = m.group(1); continue
            mi = pat_instr.search(line)
            if not mi: continue
            name = mi.group(1)
            mm = pat_meta.search(line)
            tag = f"{mm.group(1).split('/')[-1]}:{mm.group(2)}" if mm else None
            if cur_comp and tag: comp_ops[cur_comp].append(tag)
            mc = pat_calls.search(line)
            if mc: fusion_comp[name] = mc.group(1)
            if tag: src_of[name] = tag

    tfile = sorted(Path(trace_dir).rglob("*.trace.json.gz"))[-1]
    with gzip.open(tfile) as f:
        d = json.load(f)
    tids = {}
    for e in d["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    by_file, by_line, unattr = defaultdict(float), defaultdict(float), 0.0
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        dur = e.get("dur", 0) / n_calls
        name = e["name"]
        tags = (comp_ops.get(fusion_comp[name]) if name in fusion_comp else None) \
            or ([src_of[name]] if name in src_of else None)
        if not tags:
            unattr += dur; continue
        share = dur / len(tags)
        for t in tags:
            by_line[t] += share; by_file[t.split(":")[0]] += share
    print("per-call ms by source file:")
    for k, v in sorted(by_file.items(), key=lambda kv: -kv[1]):
        if v > 300: print(f"  {v/1000:7.2f}  {k}")
    print(f"  {unattr/1000:7.2f}  (unattributed)")
    print("\ntop source lines:")
    for k, v in sorted(by_line.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v/1000:7.2f}  {k}")


if __name__ == "__main__":
    attribute(sys.argv[1], sys.argv[2],
              int(sys.argv[3]) if len(sys.argv) > 3 else 3)


def attribute_scopes(trace_dir: str, hlo_path: str, n_calls: int = 3, top: int = 30):
    """Group per-call device time by jax.named_scope path in op_name metadata."""
    import gzip, json, re
    from collections import defaultdict
    from pathlib import Path
    pat_instr = re.compile(r'%([\w.\-]+) =')
    pat_op = re.compile(r'op_name="jit\(\w+\)/([^"]*)"')
    pat_comp = re.compile(r'^%?([\w.\-]+) \(.*\) -> .* \{')
    pat_calls = re.compile(r'calls=%([\w.\-]+)')
    scope_of, comp_scopes, fusion_comp = {}, defaultdict(list), {}
    cur_comp = None
    with open(hlo_path) as f:
        for line in f:
            m = pat_comp.match(line.strip())
            if m and not line.startswith("  "):
                cur_comp = m.group(1); continue
            mi = pat_instr.search(line)
            if not mi: continue
            name = mi.group(1)
            mo = pat_op.search(line)
            scope = None
            if mo:
                parts = mo.group(1).split("/")
                scope = "/".join(parts[:-1]) if len(parts) > 1 else "(top)"
            if cur_comp and scope: comp_scopes[cur_comp].append(scope)
            mc = pat_calls.search(line)
            if mc: fusion_comp[name] = mc.group(1)
            if scope: scope_of[name] = scope
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
        tags = (comp_scopes.get(fusion_comp[name]) if name in fusion_comp else None) \
            or ([scope_of[name]] if name in scope_of else None)
        if not tags:
            unattr += dur; continue
        share = dur / len(tags)
        for t in tags:
            # collapse to first two scope levels
            agg["/".join(t.split("/")[:2])] += share
    print("per-call ms by scope:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v/1000:7.2f}  {k}")
    print(f"  {unattr/1000:7.2f}  (unattributed)")
