from lins_tpu.imu.eskf import (
    FilterState, box_plus, box_minus, init_covariance, process_noise,
    initial_state, predict_step, propagate, reset_relative,
    calculate_rp_from_gravity, POS, VEL, ATT, ACC, GYR, GRA, DIM)
from lins_tpu.imu.preintegration import (
    Preintegration, init_preintegration, midpoint_step, preintegrate,
    solve_gyro_bias)
