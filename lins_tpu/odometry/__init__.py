from lins_tpu.odometry.association import (
    Matches, transform_to_start, transform_to_end, find_surf_matches,
    find_corner_matches, stack_matches)
from lins_tpu.odometry.ieskf import IESKFResult, update
from lins_tpu.odometry.gn_icp import estimate_transform
from lins_tpu.odometry.estimator import (
    LinsOdometry, NominalState, identity_nominal, running_step,
    second_scan_step, STATUS_INIT, STATUS_FIRST_SCAN, STATUS_RUNNING)
