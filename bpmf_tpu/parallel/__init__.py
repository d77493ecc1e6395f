"""SPMD execution over a jax.sharding.Mesh — the single replacement for the
reference's nine compile-time communication backends (SURVEY.md §2 #8-#18)."""
