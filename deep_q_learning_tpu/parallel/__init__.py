from deep_q_learning_tpu.parallel.mesh import (
    ENV_AXIS,
    distributed_init,
    env_sharding,
    make_env_mesh,
    replicated_sharding,
)
from deep_q_learning_tpu.parallel.distributed import (
    aggregate_metrics,
    build_distributed_superstep,
)
from deep_q_learning_tpu.parallel.population import (
    PopulationTrainer,
    build_population,
    candidate_overrides,
    set_population_hyper,
    train_population,
)
