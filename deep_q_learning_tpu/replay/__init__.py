from deep_q_learning_tpu.replay.uniform import ReplayState, UniformReplay
