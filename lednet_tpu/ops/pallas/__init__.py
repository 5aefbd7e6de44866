from lednet_tpu.ops.pallas.sesp_pyramid import sesp_pyramid  # noqa: F401
