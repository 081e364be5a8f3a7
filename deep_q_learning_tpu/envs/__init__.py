from deep_q_learning_tpu.envs.base import Environment, EnvParams, Transition, VectorEnv
from deep_q_learning_tpu.envs.cartpole import CartPole, CartPoleParams
from deep_q_learning_tpu.envs.wrappers import TimeFractionObs, WrappedEnv
