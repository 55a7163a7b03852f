"""Minimal LeRobot API stub for executing the fastvla plugin in tests.

LeRobot itself is not installable in this offline environment (SURVEY.md §2.4:
the plugin host), so this stub reproduces exactly the surface
``vla_fastvlm_tpu.lerobot_fastvla`` consumes — config registry, feature
types, policy base class, optimizer/scheduler preset dataclasses, and the
processor pipeline steps — with behavior faithful to the real package for
those pieces (verified against the reference's usage in
``/root/reference/src/vla_fastvlm/lerobot_fastvla/``). Tests insert this
directory on ``sys.path``; production environments use the real LeRobot.
"""
