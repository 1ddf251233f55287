"""Placeholder registrar module — populated in later milestones."""
