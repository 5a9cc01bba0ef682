from constraint_solver_tpu.ops.lex import (  # noqa: F401
    lex_less,
    lex_leq,
    lex_argmin,
    lex_min,
    lex_top_k,
    INF_SCORE,
)
from constraint_solver_tpu.ops.fingerprint import (  # noqa: F401
    fingerprint_i32,
    fingerprint_f32,
    fp_update,
    position_hash,
)
