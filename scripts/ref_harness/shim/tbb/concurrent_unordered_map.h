// Bridge the reference's 2017-era TBB usage onto the installed oneTBB:
//  * tbb::atomic was removed from oneTBB (kmer.h:107,155) -> std::atomic;
//  * concurrent_unordered_map's default hasher no longer covers
//    std::pair keys (family_key_t, kmer.h:93) -> provide std::hash for
//    pair<string,string>.
// Pulled in via -I ordering: this wraps the real header with
// #include_next.
#ifndef CK_REF_SHIM_TBB_CUM_H
#define CK_REF_SHIM_TBB_CUM_H

#include <atomic>
#include <functional>
#include <string>
#include <utility>

namespace std {
template <>
struct hash<std::pair<std::string, std::string>> {
    size_t operator()(const std::pair<std::string, std::string> &p) const {
        return hash<std::string>()(p.first) * 1000003u
             ^ hash<std::string>()(p.second);
    }
};
}  // namespace std

#include_next <tbb/concurrent_unordered_map.h>

namespace tbb {
template <class T> using atomic = std::atomic<T>;
}  // namespace tbb

#endif
