from . import projection, rasterize, resize, segment_ops
