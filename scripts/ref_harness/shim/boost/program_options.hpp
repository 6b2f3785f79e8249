// Minimal stand-in for boost::program_options, just wide enough to link the
// reference engine core (kguts.cc, kmer_image.cc, kmer.cc) for the parity
// harnesses.  Uses:
//  * global.h's forward declaration of variables_map;
//  * kmer_image.cc:69-76's `g_parameters->count("no-populate-mmap")` probe
//    — an always-empty map reproduces the reference default (MAP_POPULATE);
//  * kmer.cc:415's `(*g_parameters)["n-family-file-threads"].as<int>()` —
//    the harness seeds ints via set_int (default 1 when unset).
#ifndef CK_REF_SHIM_PROGRAM_OPTIONS_HPP
#define CK_REF_SHIM_PROGRAM_OPTIONS_HPP

#include <map>
#include <string>

namespace boost {
namespace program_options {

class variable_value {
public:
    explicit variable_value(int i = 1) : int_(i) {}
    template <typename T> T as() const { return T(int_); }
private:
    int int_;
};

class variables_map {
public:
    int count(const std::string &) const { return 0; }
    const variable_value &operator[](const std::string &name) const {
        auto it = ints_.find(name);
        if (it != ints_.end()) return it->second;
        static variable_value def;
        return def;
    }
    void set_int(const std::string &name, int v) {
        ints_.emplace(name, variable_value(v));
    }
private:
    std::map<std::string, variable_value> ints_;
};

}  // namespace program_options
}  // namespace boost

#endif
