"""Batch-key constants (mirrors lerobot.utils.constants)."""

ACTION = "action"
OBS_STATE = "observation.state"
OBS_IMAGES = "observation.images"
POLICY_PREPROCESSOR_DEFAULT_NAME = "policy_preprocessor"
POLICY_POSTPROCESSOR_DEFAULT_NAME = "policy_postprocessor"
