"""Composite operators: multi-step DataFrame pipelines the reference
implements imperatively, re-expressed as Catalyst-optimizable plans.
"""
