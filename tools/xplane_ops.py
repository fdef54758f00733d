"""Aggregate per-op device time from a JAX xplane trace.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xplane_ops.py /tmp/segger-trace [top_n]

Parses the ``/device:TPU:*`` plane's "XLA Ops" line and prints total
device time per op name (summed over occurrences and steps), plus a
category rollup (fusion / pallas / convert / dynamic-slice ...).  The
tensorboard profile plugin in this image can't parse xplanes (protobuf
generation mismatch), so this reads the proto directly.
"""
import collections
import glob
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/segger-trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {path}")
    # Aggregate across ALL xplane files (multi-host or repeated captures
    # produce several); name which files contribute so nothing is
    # silently dropped.
    for f in files:
        print(f"# parsing {f}")
    planes = []
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        planes.extend(xs.planes)

    for plane in planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        by_op = collections.Counter()
        n_occ = collections.Counter()
        total = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                if ev.metadata_id in meta:
                    name = meta[ev.metadata_id].name or "(unnamed)"
                else:
                    name = "(unknown)"
                by_op[name] += ev.duration_ps
                n_occ[name] += 1
                total += ev.duration_ps
        print(f"== {plane.name}: XLA-op device total "
              f"{total / 1e12 * 1e3:.3f} ms ==")
        for name, ps in by_op.most_common(top_n):
            print(f"{ps / 1e12 * 1e3:9.3f} ms  x{n_occ[name]:<4d} {name[:110]}")

        # Heuristic rollup: patterns anchored to the op-name PREFIX so
        # compound names ("fusion.123.convert") land in their leading
        # category, not whichever substring happens to match first.
        cats = collections.Counter()
        for name, ps in by_op.items():
            if re.match(r"(custom-call|tpu_custom_call)", name):
                cats["pallas/custom-call"] += ps
            elif re.match(r"fusion", name):
                cats["fusion"] += ps
            elif re.match(r"convert", name):
                cats["convert"] += ps
            elif re.match(r"(dynamic-slice|dynamic-update-slice|dynamic)",
                          name):
                cats["dynamic-slice/update"] += ps
            elif re.match(r"copy", name):
                cats["copy"] += ps
            elif re.match(r"(dot|convolution)", name):
                cats["matmul"] += ps
            else:
                cats["other"] += ps
        print("-- categories --")
        for c, ps in cats.most_common():
            print(f"{ps / 1e12 * 1e3:9.3f} ms  {c}")


if __name__ == "__main__":
    main()
