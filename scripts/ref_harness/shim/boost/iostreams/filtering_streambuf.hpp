// Compile-only stub: kmer.cc includes this but the harness never takes
// the .gz code path.
#ifndef CK_REF_SHIM_IOSTREAMS_FILTERING_HPP
#define CK_REF_SHIM_IOSTREAMS_FILTERING_HPP
#endif
