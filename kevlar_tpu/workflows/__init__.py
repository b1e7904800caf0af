"""Workflow drivers (mark-I trio pipeline lives in kevlar_tpu.workflow)."""
