"""Query plans: the engine's headline analytical queries, declared with the
DataFrame API so Catalyst owns physical planning (join strategy, pushdown,
AQE re-optimization)."""
