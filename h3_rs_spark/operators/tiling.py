"""Raster <-> vector tiling: decode image tiles and assign each tile to an
H3 cell (SURVEY.md §2.9, BASELINE.json north_star).

Runs as mapInPandas (Arrow batches of whole rows including the binary
payload); decode is fmt-dispatched:
  - 'rgb24': raw (h, w, 3) uint8 -> numpy frombuffer (lossless; the
    PSNR >= 40 dB invariant is trivially infinite — asserted in tests)
  - 'png'/'jpeg': stubbed behind NotImplementedError (no imaging libs in
    this container); the Spark-side plumbing (schema, batching, UDF
    signature) is identical and tested via 'rgb24'.

Each image is anchored at its caption lat/lng; tiles map to geo via a
per-pixel degree scale, so a w x h image covers a small geo footprint and
each (tile_x, tile_y) gets the cell of its tile-center. Output is the
exploded relation (image_id, tile_x, tile_y, cell, mean_r/g/b).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..h3core import faceijk

TILES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("cell", LongType(), False),
        StructField("mean_r", DoubleType(), False),
        StructField("mean_g", DoubleType(), False),
        StructField("mean_b", DoubleType(), False),
    ]
)


def decode_image(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """bytes -> (h, w, 3) uint8. Only 'rgb24' is decodable in-container."""
    if fmt == "rgb24":
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an imaging library not present "
        "in this environment (plumbing is fmt-dispatched; add a decoder here)"
    )


def tile_stats(px: np.ndarray, tile_px: int) -> np.ndarray:
    """(h, w, 3) -> (ty, tx, 3) per-tile channel means (vectorized)."""
    h, w, _ = px.shape
    ny, nx = h // tile_px, w // tile_px
    trimmed = px[: ny * tile_px, : nx * tile_px, :].astype(np.float64)
    return trimmed.reshape(ny, tile_px, nx, tile_px, 3).mean(axis=(1, 3))


def tile_assign(
    images: DataFrame,
    tile_px: int = 8,
    res: int = 15,
    deg_per_px: float = 1e-6,
) -> DataFrame:
    """Decode + tile + cell-assign. Input needs (image_id, bytes, w, h,
    fmt, lat, lng); Catalyst prunes everything else from the scan."""
    cols = ["image_id", "bytes", "w", "h", "fmt", "lat", "lng"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_tx, out_ty, out_cell = [], [], [], []
            out_r, out_g, out_b = [], [], []
            lat_list, lng_list = [], []
            for row in pdf.itertuples(index=False):
                px = decode_image(row.bytes, row.w, row.h, row.fmt)
                means = tile_stats(px, tile_px)
                ny, nx, _ = means.shape
                ty, tx = np.mgrid[0:ny, 0:nx]
                # tile center offsets from the image anchor (image spans
                # w*deg_per_px of longitude, centered on the anchor)
                cx = (tx + 0.5) * tile_px - row.w / 2.0
                cy = (ty + 0.5) * tile_px - row.h / 2.0
                lat_list.append(row.lat - cy.ravel() * deg_per_px)
                lng_list.append(row.lng + cx.ravel() * deg_per_px)
                n = ny * nx
                out_id.extend([row.image_id] * n)
                out_tx.extend(tx.ravel().tolist())
                out_ty.extend(ty.ravel().tolist())
                out_r.extend(means[:, :, 0].ravel().tolist())
                out_g.extend(means[:, :, 1].ravel().tolist())
                out_b.extend(means[:, :, 2].ravel().tolist())
            if not out_id:
                continue
            lats = np.concatenate(lat_list)
            lngs = np.concatenate(lng_list)
            cells = faceijk.geo_to_h3(lats, lngs, res)
            yield pd.DataFrame(
                {
                    "image_id": out_id,
                    "tile_x": np.array(out_tx, dtype=np.int32),
                    "tile_y": np.array(out_ty, dtype=np.int32),
                    "cell": cells,
                    "mean_r": out_r,
                    "mean_g": out_g,
                    "mean_b": out_b,
                }
            )

    return images.select(*cols).mapInPandas(run, schema=TILES_SCHEMA)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio; inf for identical arrays."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
