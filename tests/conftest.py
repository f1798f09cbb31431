import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inception_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        "inception_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# A legal-opinion-style fixture in the spirit of the reference's
# tests/test_data/sample_opinion.txt (Brown v. Board excerpt): multiple
# paragraphs, quoted phrases, parenthesized years, abbreviations.  Written
# fresh for this repo — not copied from the reference.
SAMPLE_OPINION = (
    "In each of the cases, minors of the Negro race seek the aid of the "
    "courts in obtaining admission to the public schools of their community "
    "on a nonsegregated basis. In each instance, they had been denied "
    "admission to schools attended by white children under laws requiring or "
    "permitting segregation according to race. This segregation was alleged "
    "to deprive the plaintiffs of the equal protection of the laws under the "
    "Fourteenth Amendment.\n\n"
    "The plaintiffs contend that segregated public schools are not \"equal\" "
    "and cannot be made \"equal,\" and that hence they are deprived of the "
    "equal protection of the laws. Because of the obvious importance of the "
    "question presented, the Court took jurisdiction (1952). Argument was "
    "heard in the 1952 Term, and reargument was heard this Term on certain "
    "questions propounded by the Court.\n\n"
    "Reargument was largely devoted to the circumstances surrounding the "
    "adoption of the Fourteenth Amendment in 1868. It covered exhaustively "
    "consideration of the Amendment in Congress, ratification by the states, "
    "then-existing practices in racial segregation, and the views of "
    "proponents and opponents of the Amendment. This discussion and our own "
    "investigation convince us that, although these sources cast some light, "
    "it is not enough to resolve the problem with which we are faced. At "
    "best, they are inconclusive.\n\n"
    "We conclude that, in the field of public education, the doctrine of "
    "\"separate but equal\" has no place. Separate educational facilities "
    "are inherently unequal. Therefore, we hold that the plaintiffs and "
    "others similarly situated are, by reason of the segregation complained "
    "of, deprived of the equal protection of the laws guaranteed by the "
    "Fourteenth Amendment."
)


@pytest.fixture(scope="session")
def sample_opinion():
    return SAMPLE_OPINION
