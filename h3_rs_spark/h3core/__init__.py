"""h3core: from-scratch vectorized (numpy) H3 v3.6 kernel.

Public surface mirrors the reference crate's operator inventory
(SURVEY.md §2) as batch array functions; the Spark engine wraps these in
Arrow-vectorized pandas UDFs (h3_rs_spark.functions.udfs).
"""

from .constants import EDGE_LENGTH_M, HEX_AREA_M2, MAX_RES, num_hexagons  # noqa: F401
from .faceijk import geo_to_h3, h3_to_geo, h3_to_geo_boundary  # noqa: F401
from .hierarchy import compact, to_children, to_parent, uncompact  # noqa: F401
from .indexing import (  # noqa: F401
    get_base_cell,
    get_resolution,
    h3_to_hex_str,
    hex_str_to_h3,
    is_pentagon,
    is_res_class3,
    is_valid,
    max_children,
)
from .regions import (  # noqa: F401
    cells_to_boundary_split,
    points_in_polygon,
    polyfill,
    polyfill_compact,
)
from .traversal import (  # noqa: F401
    h3_distance,
    h3_line,
    hex_ring,
    k_ring,
    k_ring_distances,
    neighbors,
)


def edge_length_m(res: int) -> float:
    return float(EDGE_LENGTH_M[res])


def hex_area_m2(res: int) -> float:
    return float(HEX_AREA_M2[res])


def edge_length_km(res: int) -> float:
    """km variant (§2.8 edgeLengthKm, h3-sys/src/ffi.rs:171-178)."""
    return float(EDGE_LENGTH_M[res]) / 1000.0


def hex_area_km2(res: int) -> float:
    """km^2 variant (§2.8 hexAreaKm2)."""
    return float(HEX_AREA_M2[res]) / 1_000_000.0


def are_neighbors(a, b):
    """h3IndexesAreNeighbors (§2.8, ffi.rs:251): vectorized — True
    where a and b share an edge (grid distance exactly 1)."""
    import numpy as np

    from .edges import edge_from_cells

    return edge_from_cells(
        np.atleast_1d(np.asarray(a, dtype=np.int64)),
        np.atleast_1d(np.asarray(b, dtype=np.int64)),
    ) != 0
