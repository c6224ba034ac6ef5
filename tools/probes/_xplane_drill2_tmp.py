"""Group the catch-all small fusions by OUTPUT SHAPE signature."""
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
    cnt = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            m = re.match(r"%([a-zA-Z_\-]+)", name)
            fam = m.group(1).rstrip("_.") if m else name[:20]
            if "fusion" not in fam:
                continue
            shp = re.search(r"= (\(.*?\)|\S+?) fusion\(", name)
            sig = shp.group(1)[:70] if shp else "?"
            if not sig.startswith("("):
                continue  # only the tuple-output catch-all
            agg[sig] += ev.duration_ps / 1e9
            cnt[sig] += 1
    for sig, ms in agg.most_common(15):
        print(f"{ms/3:7.2f} ms/step  x{cnt[sig]//3:4d}  {sig}")
