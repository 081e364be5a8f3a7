from deep_q_learning_tpu.utils import checkpoint
from deep_q_learning_tpu.utils.metrics import (
    MetricLogger,
    plot_history,
    stopwatch,
    trace,
)
from deep_q_learning_tpu.utils.visualize import (
    dump_trajectory,
    plot_lander_flight,
    record_trajectory,
)
