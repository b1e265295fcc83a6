from lins_tpu.geom import so3
from lins_tpu.geom.so3 import (
    skew, quat_identity, quat_mul, quat_conj, quat_inv, quat_normalize,
    quat_rotate, quat_rotate_inv, quat_to_mat, mat_to_quat,
    exp_axis, log_quat, delta_q, rinv_left,
    rpy_to_quat, ypr_to_quat, rpy_to_mat, mat_to_rpy, quat_to_rpy, mat_to_ypr,
    deg2rad, rad2deg, wrap_pi,
)
