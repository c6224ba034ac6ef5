"""List the individual ops inside the tuple-output fusion family."""
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
    full = {}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            m = re.match(r"%([a-zA-Z_\-]+)", name)
            fam = m.group(1).rstrip("_.") if m else name[:20]
            if "fusion" not in fam:
                continue
            shp = re.search(r"= (\S+?) fusion", name)
            if shp:     # single-output fusions already categorized
                continue
            agg[name[:160]] += ev.duration_ps / 1e9
    for name, ms in agg.most_common(20):
        print(f"{ms/3:7.2f} ms/step  {name}")
