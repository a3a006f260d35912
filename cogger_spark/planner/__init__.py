from .pyramid import (  # noqa: F401
    Image,
    Strip,
    Stripper,
    overview_count,
    overview_dims,
    pyramid_dag,
    tile_strip_idx,
)
