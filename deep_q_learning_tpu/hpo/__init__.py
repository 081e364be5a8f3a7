from deep_q_learning_tpu.hpo.bayesopt import (
    HPOResult,
    Param,
    REFERENCE_SPACE,
    Trial,
    make_dqn_objective,
    optimize,
)
