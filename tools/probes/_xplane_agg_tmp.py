"""Aggregate XLA-op self-time by op family for the s1024 step trace."""
import collections, re, sys
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if plane.name != "/device:TPU:0":
        continue
    ev_meta = {k: v for k, v in plane.event_metadata.items()}
    agg = collections.Counter()
    example = {}
    total = 0.0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = ev_meta[ev.metadata_id]
            name = md.name
            m = re.match(r"%([a-zA-Z_\-]+)", name)
            fam = m.group(1).rstrip("_.") if m else name[:20]
            # refine fusions by output shape token
            if fam.startswith("fusion") or "fusion" in fam:
                shp = re.search(r"= (\S+?) fusion", name)
                fam = f"fusion:{shp.group(1)[:28] if shp else '?'}"
            dur = ev.duration_ps / 1e9
            agg[fam] += dur
            total += dur
            if fam not in example:
                example[fam] = name[:130]
    print(f"total XLA-op self time: {total:.1f} ms over 3 steps -> {total/3:.1f} ms/step")
    for fam, ms in agg.most_common(40):
        print(f"{ms/3:8.2f} ms/step  {fam}")
        print(f"                ex: {example[fam][:120]}")
