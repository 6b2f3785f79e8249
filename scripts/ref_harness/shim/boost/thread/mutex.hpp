// boost::mutex / boost::lock_guard -> std equivalents (kmer.h:103,
// kmer.cc:460).
#ifndef CK_REF_SHIM_THREAD_MUTEX_HPP
#define CK_REF_SHIM_THREAD_MUTEX_HPP

#include <mutex>

namespace boost {
using mutex = std::mutex;
template <class M> using lock_guard = std::lock_guard<M>;
}  // namespace boost

#endif
