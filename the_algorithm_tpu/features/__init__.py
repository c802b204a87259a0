"""Feature subsystems: pairwise similarity (RSX), user signals (USS),
graph intersections (GFS), decayed aggregates, RealGraph."""
