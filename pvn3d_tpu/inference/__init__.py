from pvn3d_tpu.inference.meanshift import mean_shift_fit  # noqa: F401
