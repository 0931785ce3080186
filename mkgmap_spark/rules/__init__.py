"""The style-rule engine: mkgmap's query language re-expressed as
Spark Column programs.

Reference grammar (osmstyle/RuleFileReader.java, ExpressionReader.java,
ActionReader.java, TypeReader.java):

    PREDICATE [{ACTIONS}] [TYPE-DEF]

with predicates over tag values (= != =* !=* < <= > >= ~), boolean
& | ! ( ), actions (set/add/delete/name), and TYPE-DEFs carrying the
Garmin type + resolution range + continue flags.

Semantics preserved (RuleSet.resolveType, osmstyle/RuleSet.java:79-107):
rules evaluate in declaration order; the first matching TYPE-DEF wins
unless `continue`; actions mutate the tag set for subsequent rules only
under `continue with_actions` (plain `continue` reverts them for later
matching); `add` only sets absent keys, `set` overwrites.
"""

from .parser import parse_rules  # noqa: F401
from .compiler import compile_rules  # noqa: F401
from .interpreter import interpret  # noqa: F401
from .parser import used_tags  # noqa: F401
