// DevMis — recorded measurement (round 8): graph_mis_greedy at sf0.1,
// partTransitions edge set (309,441 und edges, 7,927 vertices, 7 Luby
// rounds, trace (668, 647, 647, 388, 110, 18, 3)):
//   distributed loop (smallCutoff=200k -> exceeded): 16.7 s of per-round
//     job scheduling on tiny state (3 actions x 7 rounds + barriers);
//   counted-small driver loop (smallCutoff=2M): the collected ~5 MB edge
//     list loops in milliseconds; query total 4.3 s at sf0.1 (~3 s of it
//     the shared partTransitions build, in family with fflCensus 3.2 s).
// The degree caps bound edges at 64*V, so the 2M gate is a real bound,
// not a hope. OpsSpec pins fast == distributed on a multi-round graph.
