from deep_q_learning_tpu.models.networks import QNetwork
