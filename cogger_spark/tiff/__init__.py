from .codec import (  # noqa: F401
    IFD,
    Config,
    TiffFile,
    assemble_ifd_tree,
    parse_tiff,
    rewrite,
    rewrite_ifd_tree,
    tile_order,
)
