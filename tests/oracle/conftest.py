"""Oracle-test environment: NaN debugging on (SURVEY.md §5.2).

Every oracle-suite test runs with `jax_debug_nans` enabled so a NaN
produced anywhere in the numerics (slab tests with degenerate inverse
directions, NEE geometry terms, RR weight division) fails the test at the
producing op instead of silently propagating into an image comparison.
"""

import jax
import pytest


@pytest.fixture(autouse=True)
def _debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
