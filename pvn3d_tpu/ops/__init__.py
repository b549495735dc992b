from pvn3d_tpu.ops.sampling import furthest_point_sample, gather_points  # noqa: F401
from pvn3d_tpu.ops.grouping import (  # noqa: F401
    ball_query, ball_query_multi, group_points, query_and_group)
from pvn3d_tpu.ops.interpolate import three_nn, three_interpolate  # noqa: F401
