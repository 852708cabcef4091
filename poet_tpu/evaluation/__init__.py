from poet_tpu.evaluation.pose_evaluator import PoseEvaluator, build_pose_evaluator  # noqa: F401
from poet_tpu.evaluation.ply import load_ply  # noqa: F401
