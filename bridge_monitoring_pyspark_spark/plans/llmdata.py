"""Placeholder — populated in later milestones."""

QUERIES: list = []
