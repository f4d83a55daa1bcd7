"""Single-node numpy stage contracts.

Each module re-implements one stage *contract* of the reference pipeline
(detection, angle pass, recognition, reading order) from scratch against the
deterministic synthetic font — the model weights of the reference are absent,
so these are classical-CV stand-ins with the same interfaces, per SURVEY.md §2.

The same functions run (a) single-node in pytest as the equality oracle and
(b) inside Spark pandas UDFs over Arrow batches — which is exactly the
per-executor model-singleton pattern of the reference
(obj_det/ocr_context.py:551 module-level context).
"""
