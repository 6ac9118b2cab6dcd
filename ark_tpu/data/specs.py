"""Dataset schemas for the five IntelliGraphs-style benchmark datasets.

The reference (`/root/reference`) consumes these datasets from the external
`intelligraphs` package (reference: kgvae/experiments/train.py:14-16,
pyproject.toml:16). That package is not available in this environment, so the
datasets and their semantic rules are re-derived here from the dataset
definitions the reference relies on (SURVEY.md §7 step 5): each dataset is a
collection of small knowledge graphs drawn from a rule-governed schema, and a
matching verifier (ark_tpu/eval/verifiers.py) checks those rules.

The acceptance criterion (SURVEY.md §7): 100% of generated train/val/test
graphs must verify as valid under the corresponding verifier — enforced by
tests/test_verifiers.py.

Entity/relation *labels* are surrogates with realistic structure; the sizes
are chosen to match the reference's scale story (syn-* tiny and fixed-size,
wd-movies mid-size vocab, wd-articles the largest vocab — BASELINE.json
configs[3-4]).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# syn-paths: length-3 directed paths over Dutch cities, 3 travel relations.
# ---------------------------------------------------------------------------

DUTCH_CITIES = [
    "Amsterdam", "Rotterdam", "Den Haag", "Utrecht", "Eindhoven", "Tilburg",
    "Groningen", "Almere", "Breda", "Nijmegen", "Enschede", "Haarlem",
    "Arnhem", "Zaanstad", "Amersfoort", "Apeldoorn", "Hoofddorp", "Maastricht",
    "Leiden", "Dordrecht", "Zoetermeer", "Zwolle", "Deventer", "Delft",
    "Alkmaar", "Leeuwarden", "Venlo", "Oss", "Helmond", "Hilversum",
    "Heerlen", "Sittard", "Purmerend", "Roosendaal", "Schiedam",
    "Spijkenisse", "Emmen", "Gouda", "Vlaardingen", "Almelo", "Assen",
    "Lelystad", "Ede", "Hengelo", "Kampen", "Middelburg", "Roermond",
    "Weert", "Zeist",
]
assert len(DUTCH_CITIES) == 49

SYN_PATHS_RELATIONS = ["cycle_to", "drive_to", "train_to"]
SYN_PATHS_EDGES = 3  # constant edges/graph (non-padded dataset; SURVEY Q-5)

# ---------------------------------------------------------------------------
# syn-types: typed entities with domain/range-constrained relations.
# ---------------------------------------------------------------------------

SYN_TYPES_PERSONS = [
    "Ada", "Bram", "Carice", "Daan", "Eva", "Femke", "Gijs", "Hanna",
    "Iris", "Jeroen",
]
SYN_TYPES_CITIES = [
    "Utrecht City", "Leiden City", "Delft City", "Breda City", "Zwolle City",
    "Arnhem City", "Gouda City", "Assen City", "Venlo City", "Emmen City",
]
SYN_TYPES_UNIVERSITIES = [
    "UvA", "VU", "TU Delft", "TU Eindhoven", "Leiden University",
    "Utrecht University", "Radboud", "Tilburg University", "Maastricht University",
    "Groningen University",
]
# relation -> (subject type, object type)
SYN_TYPES_SCHEMA = {
    "lives_in": ("person", "city"),
    "works_at": ("person", "university"),
    "located_in": ("university", "city"),
}
SYN_TYPES_EDGES = 3

# ---------------------------------------------------------------------------
# syn-tipr: time-indexed person roles (TIPR ontology design pattern).
# Each graph instantiates the fixed 5-edge pattern:
#   (ACADEMIC, has_role,  _:role)
#   (_:role,   has_name,  ROLE)
#   (_:role,   has_time,  _:time)
#   (_:time,   has_start, YEAR_s)
#   (_:time,   has_end,   YEAR_e)    with YEAR_s <= YEAR_e
# ---------------------------------------------------------------------------

SYN_TIPR_ACADEMICS = [
    f"{first} {last}"
    for first in ["Alan", "Grace", "Edsger", "Barbara", "John", "Ada",
                  "Donald", "Radia", "Claude", "Hedy"]
    for last in ["Turing", "Hopper", "Dijkstra", "Liskov", "McCarthy"]
]  # 50 academics
SYN_TIPR_ROLES = [
    "masters student", "phd student", "postdoc", "assistant professor",
    "associate professor", "full professor",
]
SYN_TIPR_YEARS = [str(y) for y in range(1950, 2021)]  # 71 years
SYN_TIPR_BLANKS = ["_:role", "_:time"]
SYN_TIPR_RELATIONS = ["has_role", "has_name", "has_time", "has_start", "has_end"]
SYN_TIPR_EDGES = 5

# ---------------------------------------------------------------------------
# wd-movies: one central movie node with director / cast / genre edges.
# The conditioned-generation experiment's defaults (reference:
# conditioned.py:12-13) force relation "has_director" and tail "Tim Burton",
# so both must exist in this vocabulary.
# ---------------------------------------------------------------------------

WD_MOVIES_NODE = "_:movie"
WD_MOVIES_RELATIONS = ["has_director", "has_cast", "has_genre"]
WD_MOVIES_GENRES = [
    # the 10 genres targeted by the latent-analysis experiment
    # (reference: interpolation.py:447-458)
    "Action film", "Comedy film", "Drama film", "Horror film", "Romance film",
    "Musical film", "Science fiction film", "Western film", "Bollywood",
    "Documentary film",
    # additional genres
    "Thriller film", "Fantasy film", "Adventure film", "Crime film",
    "Mystery film", "Animated film", "War film", "Biographical film",
    "Historical film", "Film noir", "Sports film", "Superhero film",
    "Disaster film", "Heist film", "Road movie", "Silent film",
    "Mockumentary", "Anthology film", "Short film", "Experimental film",
]
WD_MOVIES_FIRST_NAMES = [
    "Tim", "Sofia", "James", "Ava", "Liam", "Mia", "Noah", "Zoe", "Ethan",
    "Ella", "Lucas", "Ivy", "Mason", "Nora", "Owen", "Ruby", "Felix", "Cora",
    "Hugo", "Lena", "Oscar", "Vera", "Jasper", "Nina", "Silas", "Tessa",
    "Rufus", "Greta", "Caleb", "Dina", "Elias", "Freya", "Gustav", "Heidi",
    "Ingmar", "Jolene", "Kasper", "Lotte", "Marius", "Nadia", "Otto",
    "Paloma", "Quentin", "Rosa", "Stellan", "Uma", "Viggo", "Wanda",
    "Xavier", "Yara",
]
WD_MOVIES_LAST_NAMES = [
    "Burton", "Coppola", "Cameron", "DuVernay", "Nolan", "Bigelow", "Scott",
    "Gerwig", "Villeneuve", "Campion", "Spielberg", "Varda", "Kurosawa",
    "Zhao", "Fellini", "Ackerman", "Hitchcock", "Wong", "Tarkovsky", "Deren",
    "Bergman", "Denis", "Kubrick", "Ramsay", "Lynch", "Arnold", "Welles",
    "Reichardt", "Truffaut", "Sciamma", "Godard", "Holland", "Leone",
    "Wachowski", "Miyazaki", "Jenkins", "Bong", "Peele", "Cuaron", "Farhadi",
    "Haneke", "Iñárritu", "Jarmusch", "Kaurismaki", "Lanthimos", "Meirelles",
    "Ozu", "Parajanov", "Resnais", "Sembene", "Tarr", "Ustaoglu", "Von Trier",
    "Weerasethakul", "Xie", "Yimou", "Zvyagintsev", "Almodovar", "Breillat",
    "Chabrol", "Demme", "Eastwood", "Fincher", "Gilliam", "Herzog", "Imamura",
    "Jodorowsky", "Kieslowski", "Loach", "Malick", "Nichols", "Ophuls",
    "Polanski", "Rohmer", "Sirk", "Tati", "Ulmer", "Visconti", "Wilder",
    "Yates",
]
# 50 x 80 = 4000 persons; "Tim Burton" is guaranteed to exist.
WD_MOVIES_N_DIRECTORS = (1, 2)   # inclusive range per graph
WD_MOVIES_N_CAST = (2, 8)
WD_MOVIES_N_GENRES = (1, 3)

# ---------------------------------------------------------------------------
# wd-articles: one central article node; the largest vocabulary (stresses the
# big-vocab logit matmul + sharded embeddings — BASELINE.json configs[4]).
# ---------------------------------------------------------------------------

WD_ARTICLES_NODE = "_:article"
WD_ARTICLES_RELATIONS = ["has_author", "cites", "has_subject", "published_in"]
WD_ARTICLES_N_PERSONS = 40_000   # author names "author_00000".."author_39999"
WD_ARTICLES_N_WORKS = 15_000     # citable works "Q1000000".."Q1014999"
WD_ARTICLES_N_SUBJECTS = 3_000   # topics "topic_0000".."topic_2999"
WD_ARTICLES_N_VENUES = 800       # venues "venue_000".."venue_799"
WD_ARTICLES_N_AUTHORS = (1, 8)   # per-graph counts (inclusive ranges)
WD_ARTICLES_N_CITES = (0, 15)
WD_ARTICLES_N_SUBJ = (1, 4)
# exactly one published_in edge per graph -> edges in [3, 28]

# ---------------------------------------------------------------------------
# Split sizes (graphs per split) and generation seeds.
# ---------------------------------------------------------------------------

SPLIT_SIZES = {
    "syn-paths": (60_000, 20_000, 20_000),
    "syn-types": (60_000, 20_000, 20_000),
    "syn-tipr": (50_000, 10_000, 10_000),
    "wd-movies": (30_000, 5_000, 5_000),
    "wd-articles": (50_000, 10_000, 10_000),
}

GEN_SEEDS = {
    "syn-paths": 1001,
    "syn-types": 1002,
    "syn-tipr": 1003,
    "wd-movies": 1004,
    "wd-articles": 1005,
}


def wd_movies_persons() -> list[str]:
    return [f"{f} {l}" for f in WD_MOVIES_FIRST_NAMES for l in WD_MOVIES_LAST_NAMES]


def wd_articles_entities() -> dict[str, list[str]]:
    return {
        "persons": [f"author_{i:05d}" for i in range(WD_ARTICLES_N_PERSONS)],
        "works": [f"Q{1_000_000 + i}" for i in range(WD_ARTICLES_N_WORKS)],
        "subjects": [f"topic_{i:04d}" for i in range(WD_ARTICLES_N_SUBJECTS)],
        "venues": [f"venue_{i:03d}" for i in range(WD_ARTICLES_N_VENUES)],
    }
