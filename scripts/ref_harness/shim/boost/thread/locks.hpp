#ifndef CK_REF_SHIM_THREAD_LOCKS_HPP
#define CK_REF_SHIM_THREAD_LOCKS_HPP
#include <boost/thread/mutex.hpp>
#endif
