"""Rank device-plane op self-times from a captured vm.xplane.pb (temp tool)."""
import collections, sys
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name and "device" not in plane.name.lower():
        continue
    stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
    ev_meta = {k: v for k, v in plane.event_metadata.items()}
    agg = collections.Counter()
    cat_of = {}
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Steps" not in line.name and not line.name.startswith("XLA"):
            # keep only op-level lines; print line names once for debug
            pass
        for ev in line.events:
            md = ev_meta[ev.metadata_id]
            name = md.name
            dur = ev.duration_ps / 1e9  # ms
            agg[(line.name, name)] += dur
    by_line = collections.defaultdict(collections.Counter)
    for (ln, name), ms in agg.items():
        by_line[ln][name] += ms
    print(f"== plane: {plane.name}")
    for ln, ctr in by_line.items():
        total = sum(ctr.values())
        print(f"-- line: {ln}  total {total:.1f} ms, {len(ctr)} distinct")
        for name, ms in ctr.most_common(25):
            print(f"   {ms:8.2f} ms  {name[:110]}")
