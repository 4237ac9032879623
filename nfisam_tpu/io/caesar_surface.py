"""Vendored Caesar.jl / IncrementalInference.jl API surface.

The image has no Julia runtime, so the emitted bridge scripts
(``io/caesar.py``) cannot be executed against live Caesar here (the
reference ran its bridge out-of-band too — the committed artifact is
``example/.../case1/mmisam/timing``).  What CAN be pinned mechanically is
the API surface: every construct the emitter uses, with the exact call
shape, as documented by RoME.jl / IncrementalInference.jl and exercised
by the reference's own executed bridge
(``src/external/caesar/fg2caesar.jl:265-300`` — addVariable!/addFactor!
with Pose2/Point2/PriorPose2/Pose2Pose2/Pose2Point2Range/multihypo;
solveTree! / getBelief / getPoints usage :320-380).

``ALLOWED_LINES`` is the grammar of every statement an emitted script may
contain; ``tests/test_caesar_surface.py`` validates emissions against it,
so any drift in the emitter (renamed call, wrong argument shape) fails CI
instead of failing months later on a Julia host.
"""
import re

# one regex per permitted statement form (fullmatch, after strip)
ALLOWED_LINES = [
    r"",                                        # blank
    r"#.*",                                     # comment
    r"using RoME, IncrementalInference, Distributions",
    r"using DelimitedFiles",
    r"fg = initfg\(\)",
    r'output_dir = "[^"]+"',
    r"mkpath\(output_dir\)",
    r"getSolverParams\(fg\)\.N = \d+",
    # addVariable!(fg, :X0, Pose2) | Point2
    r"addVariable!\(fg, :[A-Za-z]\w*, (Pose2|Point2)\)",
    # PriorPose2 on one variable
    r"addFactor!\(fg, \[:[A-Za-z]\w*\], PriorPose2\(MvNormal\("
    r"\[[^\]]+\], \[[^\]]+\]\)\)\)",
    # Pose2Pose2 between two variables
    r"addFactor!\(fg, \[:[A-Za-z]\w*, :[A-Za-z]\w*\], "
    r"Pose2Pose2\(MvNormal\(\[[^\]]+\], \[[^\]]+\]\)\)\)",
    # Pose2Point2Range between pose and landmark
    r"addFactor!\(fg, \[:[A-Za-z]\w*, :[A-Za-z]\w*\], "
    r"Pose2Point2Range\(Normal\([^)]+\)\)\)",
    # multihypo data association (>=2 observed candidates)
    r"addFactor!\(fg, \[:[A-Za-z]\w*(?:, :[A-Za-z]\w*){2,}\], "
    r"(Pose2Point2Range\(Normal\([^)]+\)\)|"
    r"Pose2Pose2\(MvNormal\(\[[^\]]+\], \[[^\]]+\]\)\)), "
    r"multihypo=\[[^\]]+\]\)",
    r"tree = solveTree!\(fg\)",
    r'open\(joinpath\(output_dir, "step\d+"\), "w"\) do io',
    r"writedlm\(io, getPoints\(getBelief\(fg, :[A-Za-z]\w*\)\)'\)",
    r"end",
]

_COMPILED = [re.compile(p) for p in ALLOWED_LINES]


def validate_script(script: str):
    """Return a list of (line_no, line) statements not matching the
    vendored surface; empty list == conformant."""
    bad = []
    for i, raw in enumerate(script.splitlines(), start=1):
        line = raw.strip()
        if not any(p.fullmatch(line) for p in _COMPILED):
            bad.append((i, line))
    return bad
