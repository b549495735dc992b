from pvn3d_tpu.geometry.se3 import (  # noqa: F401
    best_fit_transform,
    transform_points,
    compose_rt,
)
from pvn3d_tpu.geometry.metrics import (  # noqa: F401
    cal_add,
    cal_adds,
    cal_auc,
    voc_ap,
    add_accuracy_at,
)
from pvn3d_tpu.geometry.cloud import (  # noqa: F401
    depth_to_cloud,
    depth_to_cloud_map,
    project_points,
)
