"""Pure scalar kernel libraries: text cleaning, URL handling, HTML, dates.

These are the byte-exact reimplementations of the reference's scalar
operator inventory (SURVEY.md §2.2/§2.3/§2.9). Everything here is a pure
function (or a vectorized Arrow wrapper around one) with no Ray
dependency, so the same kernels run inside ``map_batches`` stages, inside
the sequential reference-semantics simulator, and inside unit tests.
"""
