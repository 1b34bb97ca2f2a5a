from .registry import QUERIES, QueryDef, load_tables, register  # noqa: F401

# Importing the plan modules populates the registry.
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import sampling_plans  # noqa: E402,F401
from . import temporal_plans  # noqa: E402,F401
from . import scale_plans  # noqa: E402,F401
