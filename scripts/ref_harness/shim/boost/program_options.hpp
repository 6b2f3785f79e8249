// Minimal stand-in for boost::program_options, just wide enough to link the
// reference engine core (kguts.cc, kmer_image.cc) for the parity harness.
// The only uses are global.h's forward declaration of variables_map and
// kmer_image.cc:69-76's `g_parameters->count("no-populate-mmap")` probe —
// an always-empty map reproduces the reference's default behavior
// (MAP_POPULATE enabled).
#ifndef CK_REF_SHIM_PROGRAM_OPTIONS_HPP
#define CK_REF_SHIM_PROGRAM_OPTIONS_HPP

#include <string>

namespace boost {
namespace program_options {

class variable_value {
public:
    template <typename T> T as() const { return T(); }
};

class variables_map {
public:
    int count(const std::string &) const { return 0; }
    const variable_value &operator[](const std::string &) const {
        static variable_value v;
        return v;
    }
};

}  // namespace program_options
}  // namespace boost

#endif
