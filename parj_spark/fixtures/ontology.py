"""Mini-ontology (LUBM-flavored) shared by the generator, extractor and linker.

Mirrors the predicate/class vocabulary of the reference's embedded LUBM corpus
(/root/reference/exareme-master/.../QueryTester.java:107-119). `rdf:type` is
deliberately the hottest predicate (skew fixture, SURVEY.md §7.3).

Entity naming scheme (drives deterministic generation AND extraction):
  University_{u}                     Department_{u}_{d}
  {Class}_{u}_{d}_{i}                for dept-local entities
Mention surface forms are single tokens: the canonical local name, or an
alias obtained by swapping the class prefix (one-hop: ALIAS1, two-hop: ALIAS2
-> ALIAS1 -> canonical). Two-hop aliases make union-find canonicalization
load-bearing: only transitivity connects `Pr_0_1_2` to `FullProfessor_0_1_2`.
"""

from __future__ import annotations

import hashlib

UB = "ub:"
RDF_TYPE = "rdf:type"

P_TEACHER_OF = UB + "teacherOf"
P_ADVISOR = UB + "advisor"
P_TAKES_COURSE = UB + "takesCourse"
P_MEMBER_OF = UB + "memberOf"
P_SUB_ORG_OF = UB + "subOrganizationOf"
P_DEGREE_FROM = UB + "undergraduateDegreeFrom"
P_WORKS_FOR = UB + "worksFor"
P_NAME = UB + "name"
P_EMAIL = UB + "emailAddress"
P_TELEPHONE = UB + "telephone"

PREDICATES = [
    RDF_TYPE, P_TEACHER_OF, P_ADVISOR, P_TAKES_COURSE, P_MEMBER_OF,
    P_SUB_ORG_OF, P_DEGREE_FROM, P_WORKS_FOR, P_NAME, P_EMAIL, P_TELEPHONE,
]

C_UNIVERSITY = "University"
C_DEPARTMENT = "Department"
C_COURSE = "Course"
C_FULL_PROFESSOR = "FullProfessor"
C_UG_STUDENT = "UndergraduateStudent"
C_GRAD_STUDENT = "GraduateStudent"
C_RESEARCH_GROUP = "ResearchGroup"

CLASSES = [
    C_UNIVERSITY, C_DEPARTMENT, C_COURSE, C_FULL_PROFESSOR,
    C_UG_STUDENT, C_GRAD_STUDENT, C_RESEARCH_GROUP,
]

# one-hop alias class prefixes (canonical -> alias) and two-hop (alias -> alias2)
ALIAS1 = {
    C_FULL_PROFESSOR: "Prof",
    C_UG_STUDENT: "UGStudent",
    C_GRAD_STUDENT: "GradStudent",
    C_UNIVERSITY: "Univ",
    C_DEPARTMENT: "Dept",
    C_COURSE: "Crs",
    C_RESEARCH_GROUP: "RGroup",
}
ALIAS2 = {
    "Prof": "Pr",
    "UGStudent": "UGS",
    "GradStudent": "GrS",
    "Univ": "Uni",
    "Dept": "Dp",
    "Crs": "Cr",
    "RGroup": "RGr",
}

# surface-token prefix -> its one-hop-more-canonical prefix (linking hop table)
NORMALIZE_HOP: dict[str, str] = {}
for _canon, _a1 in ALIAS1.items():
    NORMALIZE_HOP[_a1] = _canon
for _a1, _a2 in ALIAS2.items():
    NORMALIZE_HOP[_a2] = _a1

CANONICAL_PREFIXES = set(CLASSES)

# Layout constants (entities per department)
DEPTS_PER_UNIV = 3
N_PROF = 2
N_COURSE = 3
N_UG = 4
N_GRAD = 2


def entity_uri(local: str) -> str:
    return UB + local


def class_uri(cls: str) -> str:
    return UB + cls


def univ_local(u: int) -> str:
    return f"{C_UNIVERSITY}_{u}"


def dept_local(u: int, d: int) -> str:
    return f"{C_DEPARTMENT}_{u}_{d}"


def ent_local(cls: str, u: int, d: int, i: int) -> str:
    return f"{cls}_{u}_{d}_{i}"


def surface_for(local: str, hop: int) -> str:
    """Render an entity local name at alias hop 0 (canonical), 1 or 2."""
    prefix, _, rest = local.partition("_")
    if hop >= 1:
        prefix = ALIAS1.get(prefix, prefix)
    if hop >= 2:
        prefix = ALIAS2.get(prefix, prefix)
    return f"{prefix}_{rest}"


def surface_prefix(surface: str) -> str:
    return surface.partition("_")[0]


def normalize_one_hop(surface: str) -> str | None:
    """One hop toward canonical; None if already canonical / unknown prefix."""
    prefix, _, rest = surface.partition("_")
    nxt = NORMALIZE_HOP.get(prefix)
    return f"{nxt}_{rest}" if nxt else None


def is_canonical_surface(surface: str) -> bool:
    return surface_prefix(surface) in CANONICAL_PREFIXES


def name_literal(local: str) -> str:
    return f"Name {local}"


def email_literal(local: str) -> str:
    return f"{local.lower()}@example.org"


def telephone_literal(local: str) -> str:
    h = hashlib.md5(local.encode()).hexdigest()
    return f"+1-555-{int(h[:4], 16) % 10000:04d}"


# --- sentence templates ------------------------------------------------------
# template id -> (predicate, python format, is_literal_object)
SENTENCES = {
    "type": (RDF_TYPE, "{s} is a {o}.", False),
    "teacherOf": (P_TEACHER_OF, "{s} teaches {o}.", False),
    "worksFor": (P_WORKS_FOR, "{s} works for {o}.", False),
    "subOrganizationOf": (P_SUB_ORG_OF, "{s} is part of {o}.", False),
    "takesCourse": (P_TAKES_COURSE, "{s} takes {o}.", False),
    "advisor": (P_ADVISOR, "{s} is advised by {o}.", False),
    "memberOf": (P_MEMBER_OF, "{s} is a member of {o}.", False),
    "undergraduateDegreeFrom": (P_DEGREE_FROM, "{s} got a degree from {o}.", False),
    "name": (P_NAME, '{s} has name "{o}".', True),
    "emailAddress": (P_EMAIL, '{s} has email "{o}".', True),
    "telephone": (P_TELEPHONE, '{s} has telephone "{o}".', True),
}

# regexes for the extractor (template id -> pattern with (s)(o) groups)
EXTRACT_PATTERNS = {
    "type": r"^(\S+) is a (\S+)\.$",
    "teacherOf": r"^(\S+) teaches (\S+)\.$",
    "worksFor": r"^(\S+) works for (\S+)\.$",
    "subOrganizationOf": r"^(\S+) is part of (\S+)\.$",
    "takesCourse": r"^(\S+) takes (\S+)\.$",
    "advisor": r"^(\S+) is advised by (\S+)\.$",
    "memberOf": r"^(\S+) is a member of (\S+)\.$",
    "undergraduateDegreeFrom": r"^(\S+) got a degree from (\S+)\.$",
    "name": r'^(\S+) has name "(.+)"\.$',
    "emailAddress": r'^(\S+) has email "(.+)"\.$',
    "telephone": r'^(\S+) has telephone "(.+)"\.$',
}
