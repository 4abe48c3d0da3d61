"""sameAs-edge fixture generator + expected components (FIXTURES.md §7).

Plants K components with adversarial shapes — chains (worst case for
naive propagation: O(length) rounds vs O(log) for star algorithms),
stars, one cycle, one 2-node island — and computes the expected
``(iri, canonical_iri)`` mapping with canonical = natsort-min member.
"""

from __future__ import annotations

from ..kernel.norm import natsort_key

NS = "http://uri.interlex.org/temp/uris/ent_"


def _iri(i: int) -> str:
    return f"{NS}{i}"


def make_sameas_fixture(chain_len: int = 60, star_size: int = 40,
                        cycle_len: int = 12):
    """Returns (edges [(a,b)...], expected {iri: canonical_iri})."""
    edges: list[tuple[str, str]] = []
    comps: list[list[str]] = []
    base = 0

    # chain: 0-1-2-...-n
    chain = [_iri(base + i) for i in range(chain_len)]
    edges += list(zip(chain, chain[1:]))
    comps.append(chain)
    base += chain_len

    # star: hub = natsort-LAST member so canonical != hub
    hub = _iri(base + star_size - 1)
    leaves = [_iri(base + i) for i in range(star_size - 1)]
    edges += [(hub, leaf) for leaf in leaves]
    comps.append([hub] + leaves)
    base += star_size

    # cycle
    cyc = [_iri(base + i) for i in range(cycle_len)]
    edges += list(zip(cyc, cyc[1:])) + [(cyc[-1], cyc[0])]
    comps.append(cyc)
    base += cycle_len

    # 2-node island
    island = [_iri(base), _iri(base + 1)]
    edges.append((island[0], island[1]))
    comps.append(island)
    base += 2

    # natsort traps: ent_9 vs ent_10 style members in one component
    trap = [f"{NS}x{k}" for k in (9, 10, 2, 100)]
    edges += list(zip(trap, trap[1:]))
    comps.append(trap)

    expected: dict[str, str] = {}
    for comp in comps:
        canon = min(comp, key=natsort_key)
        for m in comp:
            expected[m] = canon
    return edges, expected
