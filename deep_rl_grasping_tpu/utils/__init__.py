from deep_rl_grasping_tpu.utils import transforms, io_utils, camera_utils, config
