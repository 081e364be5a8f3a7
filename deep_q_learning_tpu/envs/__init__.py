from deep_q_learning_tpu.envs.base import Environment, EnvParams, Transition, VectorEnv
from deep_q_learning_tpu.envs.acrobot import Acrobot, AcrobotParams
from deep_q_learning_tpu.envs.cartpole import CartPole, CartPoleParams
from deep_q_learning_tpu.envs.mountain_car import MountainCar, MountainCarParams
from deep_q_learning_tpu.envs.lunar_lander import LunarLander, LunarLanderParams
from deep_q_learning_tpu.envs.wrappers import TimeFractionObs, WrappedEnv
from deep_q_learning_tpu.envs.heuristic import heuristic_action
from deep_q_learning_tpu.envs.registry import available_envs, make_env
