"""h3util: CLI parity with the reference crate's binary
(/root/reference/src/bin/h3util.rs + cli-defs.yaml), backed by the
from-scratch numpy kernel.

The reference implements only `point-to-index` and `index-to-boundary`;
`boundary-to-index`, `index-to-components`, `index-to-hex-range` and
`index-to-k-ring` are parsed but their handlers are empty stubs
(src/bin/h3util.rs:177-195). This CLI implements all of them.

Output parity notes: `point-to-index` prints `H3Index=<decimal>` like
the reference (src/bin/h3util.rs:173 Display -> decimal); boundary
output is a GeoJSON FeatureCollection (src/bin/h3util.rs:149-157).

Usage examples:
  python tools/h3util.py point-to-index --longitude -122.05 --latitude 37.36 --resolution 5
  python tools/h3util.py index-to-boundary --indexes 599686042433355775
  python tools/h3util.py index-to-k-ring --index 599686042433355775 --k 2
  python tools/h3util.py index-to-components --index 599686042433355775
  python tools/h3util.py boundary-to-index --geojson '<polygon>' --resolution 9
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from h3_rs_spark import h3core as h3  # noqa: E402
from h3_rs_spark.h3core import indexing as ix  # noqa: E402


def cmd_point_to_index(args):
    h = h3.geo_to_h3(
        np.array([args.latitude]), np.array([args.longitude]), args.resolution
    )
    if int(h[0]) == 0:
        raise SystemExit("error: unable to index point")
    print(f"H3Index={int(h[0])}")


def _boundary_feature(idx: int) -> dict:
    blat, blng = h3.h3_to_geo_boundary(np.array([idx]))
    ring = [
        [float(blng[0, v]), float(blat[0, v])]
        for v in range(6)
        if not np.isnan(blat[0, v])
    ]
    ring.append(ring[0])
    return {
        "type": "Feature",
        "properties": {"h3": format(idx, "x"), "h3_decimal": str(idx)},
        "geometry": {"type": "Polygon", "coordinates": [ring]},
    }


def _parse_indexes(strs):
    out = []
    for s in strs:
        try:
            v = int(s, 16) if set(s.lower()) & set("abcdef") else int(s)
        except ValueError:
            raise SystemExit(
                f"error: not a decimal or hex H3 index: {s!r}"
            ) from None
        if not bool(ix.is_valid(np.array([v]))[0]):
            raise SystemExit(f"error: invalid H3 index: {s}")
        out.append(v)
    return out


def cmd_index_to_boundary(args):
    feats = [_boundary_feature(i) for i in _parse_indexes(args.indexes)]
    print(json.dumps({"type": "FeatureCollection", "features": feats}))


def cmd_index_to_k_ring(args):
    (idx,) = _parse_indexes([args.index])
    _, cells, dist = h3.k_ring_distances(np.array([idx]), args.k)
    order = np.lexsort((cells, dist))
    print(
        json.dumps(
            [
                {"h3": format(int(cells[i]), "x"), "k": int(dist[i])}
                for i in order
            ]
        )
    )


def cmd_index_to_hex_range(args):
    (idx,) = _parse_indexes([args.index])
    _, cells = h3.hex_ring(np.array([idx]), args.k)
    print(json.dumps(sorted(format(int(c), "x") for c in cells)))


def cmd_index_to_components(args):
    (idx,) = _parse_indexes([args.index])
    arr = np.array([idx])
    digits = ix.get_digits(arr)[0]
    res = int(ix.get_resolution(arr)[0])
    lat, lng = h3.h3_to_geo(arr)
    print(
        json.dumps(
            {
                "h3": format(idx, "x"),
                "resolution": res,
                "base_cell": int(ix.get_base_cell(arr)[0]),
                "is_pentagon": bool(ix.is_pentagon(arr)[0]),
                "is_res_class3": bool(res % 2 == 1),
                "digits": [int(d) for d in digits[:res]],
                "centroid": {"lat": float(lat[0]), "lng": float(lng[0])},
            }
        )
    )


def cmd_boundary_to_index(args):
    gj = json.loads(args.geojson)
    geom = gj.get("geometry", gj)
    if geom["type"] != "Polygon":
        raise SystemExit("error: only Polygon GeoJSON is supported")
    rings = geom["coordinates"]
    cells = h3.polyfill(rings[0], rings[1:], args.resolution)
    if args.compact:
        cells = h3.compact(cells)
    print(json.dumps(sorted(format(int(c), "x") for c in cells)))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="h3util")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("point-to-index", help="lat/lng -> H3 cell")
    p.add_argument("--longitude", type=float, required=True)
    p.add_argument("--latitude", type=float, required=True)
    p.add_argument("--resolution", type=int, required=True, choices=range(16))
    p.set_defaults(fn=cmd_point_to_index)

    p = sub.add_parser("index-to-boundary", help="cells -> GeoJSON boundaries")
    p.add_argument("--indexes", nargs="+", required=True)
    p.set_defaults(fn=cmd_index_to_boundary)

    p = sub.add_parser("index-to-k-ring", help="filled disk around a cell")
    p.add_argument("--index", required=True)
    p.add_argument("--k", type=int, default=1)
    p.set_defaults(fn=cmd_index_to_k_ring)

    p = sub.add_parser("index-to-hex-range", help="hollow ring at distance k")
    p.add_argument("--index", required=True)
    p.add_argument("--k", type=int, default=1)
    p.set_defaults(fn=cmd_index_to_hex_range)

    p = sub.add_parser("index-to-components", help="inspect a cell")
    p.add_argument("--index", required=True)
    p.set_defaults(fn=cmd_index_to_components)

    p = sub.add_parser("boundary-to-index", help="GeoJSON polygon -> cells")
    p.add_argument("--geojson", required=True)
    p.add_argument("--resolution", type=int, required=True, choices=range(16))
    p.add_argument("--compact", action="store_true")
    p.set_defaults(fn=cmd_boundary_to_index)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
