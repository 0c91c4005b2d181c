"""Placeholder — populated as coverage widens (round 1 build order)."""
