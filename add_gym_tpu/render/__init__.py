from add_gym_tpu.render.mesh import (  # noqa: F401
    RobotMeshModel, render_frames, save_video,
)
