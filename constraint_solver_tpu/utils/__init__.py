from constraint_solver_tpu.utils.seeding import seed_string_to_key, hash_str  # noqa: F401
