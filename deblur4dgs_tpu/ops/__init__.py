from deblur4dgs_tpu.ops import lie  # noqa: F401
