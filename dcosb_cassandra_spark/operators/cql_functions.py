"""Placeholder — populated in later milestones (SURVEY.md §7 phases)."""
