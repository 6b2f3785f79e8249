// Minimal stand-in for boost::timer::cpu_timer: global.h declares a
// `g_timer` global but the engine-core translation units never touch it.
#ifndef CK_REF_SHIM_TIMER_HPP
#define CK_REF_SHIM_TIMER_HPP

namespace boost {
namespace timer {

class cpu_timer {
public:
    cpu_timer() {}
    void start() {}
    void stop() {}
};

}  // namespace timer
}  // namespace boost

#endif
