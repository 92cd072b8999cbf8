from ilqr_tpu.models.base import (
    System, INTEGRATORS, quad_form, matvec,
    quadratic_cost_params, quadratic_stage_cost, quadratic_terminal_cost,
)
from ilqr_tpu.models.pendulum import make_pendulum
from ilqr_tpu.models.double_pendulum import make_double_pendulum
from ilqr_tpu.models.cartpole import make_cartpole
from ilqr_tpu.models.quadrotor import make_quadrotor, hover_controls
from ilqr_tpu.models.car import make_car, obstacle_constraints
from ilqr_tpu.models.linear import make_lti, cont2disc
from ilqr_tpu.models.tracking import (
    make_tracking_system, augment_x0, strip_clock,
)
